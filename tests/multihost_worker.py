"""Worker for the multi-process jax.distributed test (run via subprocess).

Each process owns a shard of coder streams; tables build on process 0 and
broadcast (`build_tables_replicated`); byte buffers gather in process
order (`gather_bytes`).  Process 0 writes the gathered result to an npz
for the launching test to compare against a single-process encode.

Usage: multihost_worker.py <coordinator> <num_procs> <pid> <out.npz>
"""

import sys

import numpy as np


def main():
    coordinator, num_procs, pid, out_path = sys.argv[1:5]
    num_procs, pid = int(num_procs), int(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Initialize BEFORE importing the package (module imports may touch
    # the backend, after which jax.distributed.initialize refuses).
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs,
        process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()

    from compression_tpu.parallel import multihost  # noqa: F401
    from compression_tpu.codec import jax_coder, tables

    def build_fn():
        # Deliberately only meaningful on process 0: the broadcast must
        # make every process identical.
        pmf = 1.0 / (1 + np.arange(16)) ** 1.3
        pmf /= pmf.sum()
        cdf = tables.pmf_to_quantized_cdf(pmf, 10)
        ragged = tables.build_ragged_cdf([cdf], [10], [False])
        return ragged, np.zeros(1, np.int32)

    if pid == 0:
        ragged, cdf_offset = multihost.build_tables_replicated(build_fn)
    else:
        boom = lambda: (_ for _ in ()).throw(
            AssertionError("build_fn must only run on process 0"))
        ragged, cdf_offset = multihost.build_tables_replicated(boom)
    table = tables.parse_ragged_cdf(np.asarray(ragged, np.int32))

    # Global workload: 8 streams x 32 symbols, sharded process-major.
    rng = np.random.RandomState(0)
    symbols = rng.randint(0, 16, size=(8, 32)).astype(np.int32)
    per = symbols.shape[0] // num_procs
    local = symbols[pid * per : (pid + 1) * per]

    buf, lengths = jax_coder.encode_streams(local, table)
    buf_g, len_g = multihost.gather_bytes(buf, lengths)

    # --- phase 2: data-parallel TRAINING step across processes --------
    # Gradients all-reduce over the jax.distributed transport (the DCN
    # path on a real pod); the resulting replicated params must equal a
    # single-process step on the full global batch (the launching test
    # checks this against params_after).
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from compression_tpu.models import bls2017
    from compression_tpu.parallel import sharding as sh

    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev, 1),
                ("data", "model"))
    model = bls2017.BLS2017Model(lmbda=0.01, num_filters=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), training=False)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    batch_global = np.asarray(
        np.random.RandomState(5).randint(0, 256, (4, 16, 16, 3)),
        np.float32)
    per_b = batch_global.shape[0] // num_procs
    local_b = batch_global[pid * per_b:(pid + 1) * per_b]

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    to_global = lambda tree, s: jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        tree)
    params = to_global(params, repl)
    opt_state = to_global(opt_state, repl)
    batch = jax.make_array_from_process_local_data(data, local_b)

    step = sh.data_parallel_train_step(
        mesh, bls2017.make_train_step(model, optimizer))
    key = jax.random.PRNGKey(7)
    for i in range(2):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub)
    # Params are fully replicated: the local replica IS the global value.
    params_local = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), params)
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))

    if pid == 0:
        flat, _ = jax.tree_util.tree_flatten(params_local)
        np.savez(out_path, buf=buf_g, lengths=len_g, symbols=symbols,
                 ragged=np.asarray(ragged, np.int32),
                 batch=batch_global, loss=np.float32(loss),
                 **{f"param_{i}": np.asarray(leaf)
                    for i, leaf in enumerate(flat)})
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
