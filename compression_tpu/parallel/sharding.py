"""Multi-chip parallelism for training and coding.

The reference is single-process (SURVEY.md §2.13); parallelism here is
first-class and TPU-native:

  * training: data parallelism over the batch axis + tensor parallelism
    over latent channels, expressed with `jax.sharding.NamedSharding`
    constraints on a (data, model) mesh — XLA inserts the psum/all-gather
    collectives over ICI.
  * coding: independent coder streams are the scaling axis; images/blocks
    shard across devices, CDF tables replicate, per-stream byte buffers
    gather back in deterministic order for container assembly
    (host 0 concatenates, reproducing the reference byte layout).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_train_step",
    "tp_shardings_like",
    "dp_tp_train_step",
    "sharded_encode",
]


def make_mesh(n_devices: Optional[int] = None, data_axis: Optional[int] = None):
    """Creates a (data, model) mesh over the available devices.

    The model axis is kept small (<= 2) unless there are many devices;
    coding workloads scale along data, GDN/conv channel shardings along
    model.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data_axis is None:
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data_axis = n // model
    model = n // data_axis
    if data_axis * model != n:
        raise ValueError(f"Cannot factor {n} devices into mesh.")
    dev_array = np.asarray(devices).reshape(data_axis, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Shards the leading axis of every leaf over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicates a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def data_parallel_train_step(mesh: Mesh, train_step):
    """Wraps a (params, opt_state, batch, key) step for DP execution.

    Params/opt_state replicate; the batch shards over the data axis;
    gradients all-reduce automatically through XLA's SPMD partitioner.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
    )


def tp_shardings_like(mesh: Mesh, tree):
    """NamedSharding tree for tensor parallelism over the model axis.

    Rank-4 conv kernels (H, W, I, O) shard their output-channel dim over
    "model" when divisible; every other leaf replicates.  Applying the
    same rule to the optimizer state shards Adam's mu/nu alongside the
    weights (they mirror the param tree), so TP actually reduces
    per-device optimizer memory instead of replicating it.

    The model axis is looked up by NAME; a mesh without a "model" axis
    (e.g. 1-D pure-DP) replicates every leaf instead of raising
    (ADVICE r3: indexing mesh.devices.shape[1] broke on 1-D meshes).
    """
    model = int(dict(mesh.shape).get("model", 1))

    def spec(x):
        shape = getattr(x, "shape", ())
        if (model > 1 and len(shape) == 4
                and shape[-1] % model == 0 and shape[-1] >= model):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def dp_tp_train_step(mesh: Mesh, train_step, params, opt_state):
    """DP over the batch axis + TP over conv output channels.

    Params and optimizer state carry `tp_shardings_like` shardings in
    AND out (weights stay sharded across steps); the batch shards over
    data; XLA's SPMD partitioner inserts the all-gathers on the
    channel-sharded convs and the gradient psums over ICI.

    Returns (jitted step, sharded params, sharded opt_state).
    """
    p_sh = tp_shardings_like(mesh, params)
    o_sh = tp_shardings_like(mesh, opt_state)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    step = jax.jit(
        train_step,
        in_shardings=(p_sh, o_sh, data, repl),
        out_shardings=(p_sh, o_sh, repl),
    )
    params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, o_sh)
    return step, params, opt_state


def sharded_encode(mesh: Mesh, encode_fn, symbols, indexes):
    """Runs a jittable encode over streams sharded across the data axis.

    Args:
      mesh: device mesh.
      encode_fn: (symbols [S, N], indexes [S, N]) -> (bytes [S, L], len [S]),
        jit-compatible (e.g. closure over micro_ops_from_symbols +
        encode_core).
      symbols, indexes: int32 [S, N]; S must divide by the data axis size.

    Returns:
      (byte buffer [S, L] uint8, lengths [S] int32) gathered in stream
      order — deterministic container assembly regardless of device count.
    """
    data = NamedSharding(mesh, P("data"))
    encode_j = jax.jit(
        encode_fn, in_shardings=(data, data), out_shardings=(data, data))
    buf, lengths = encode_j(symbols, indexes)
    # Device-order gather is implicit: the addressable shards concatenate
    # in index order along the stream axis.
    return np.asarray(buf), np.asarray(lengths)
