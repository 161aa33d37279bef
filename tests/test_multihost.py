"""Real multi-process jax.distributed coverage (2 CPU processes).

SURVEY.md §2.13/§5: table broadcast from process 0 and deterministic
process-order bitstream gather must reproduce the single-process bytes
exactly.  The reference has no multi-process anything; this is the
TPU-native scaling contract.
"""

import os
import socket
import subprocess
import sys

import numpy as np
from compression_tpu.codec import jax_coder, tables

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_table_broadcast_and_gather(tmp_path):
    port = _free_port()
    out = str(tmp_path / "gathered.npz")
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        # Scrubbed env (no axon sitecustomize), pure CPU backend.
        "PYTHONPATH": os.path.dirname(os.path.dirname(_WORKER)),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, f"127.0.0.1:{port}", "2", str(pid),
             out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=240)
            outputs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    data = np.load(out)
    table = tables.parse_ragged_cdf(data["ragged"])
    # Single-process encode of the full batch == gathered multi-process
    # bytes, stream for stream.
    buf0, len0 = jax_coder.encode_streams(data["symbols"], table)
    np.testing.assert_array_equal(len0, data["lengths"])
    np.testing.assert_array_equal(buf0, data["buf"])
    # And the gathered streams decode back to the symbols.
    sym, sanity = jax_coder.decode_streams(
        data["buf"], data["lengths"], data["symbols"].shape[1], table)
    np.testing.assert_array_equal(sym, data["symbols"])
    assert bool(np.all(sanity))

    # Phase 1b: the FLAGSHIP sidecar coder path across processes (the
    # same traced EM method the native containers dispatch) — gathered
    # bytes + escape sidecar must byte-match a single-process sidecar
    # encode with the broadcast tables, and decode back exactly.
    from compression_tpu.entropy_models import (
        ContinuousBatchedEntropyModel)

    em = ContinuousBatchedEntropyModel.from_config(dict(
        coding_rank=3, compression=True, stateless=False,
        expected_grads=False, tail_mass=2 ** -8,
        cdf_shapes=(int(data["em_cdf"].shape[0]),
                    int(data["em_off"].shape[0])),
        prior_shape=(4,), offset_heuristic=False,
        quantization_offset=False))
    em.set_weights([data["em_cdf"], data["em_off"]])
    rows = data["sidecar_rows"]
    buf1, len1, ep1, ev1 = em.compress_sidecar(rows)
    assert (jax_coder.to_bytes_list(
                np.asarray(buf1).reshape(rows.shape[0], -1),
                np.asarray(len1).reshape(-1))
            == jax_coder.to_bytes_list(
                data["sidecar_buf"], data["sidecar_lens"]))
    n_elem = int(np.prod(rows.shape[1:]))
    pos1 = (ep1.reshape(-1, 2)[:, 0] * n_elem
            + ep1.reshape(-1, 2)[:, 1]).astype(np.int64)
    np.testing.assert_array_equal(
        np.sort(pos1), np.sort(data["sidecar_esc_pos"]))
    out_rows = em.decompress_sidecar(
        np.asarray(buf1).reshape(rows.shape[0], -1),
        np.asarray(len1).reshape(-1), rows.shape[1:-1],
        np.stack(np.divmod(data["sidecar_esc_pos"], n_elem), 1),
        data["sidecar_esc_val"])
    np.testing.assert_array_equal(
        out_rows.reshape(rows.shape), np.asarray(em.quantize(rows)))


def test_two_process_training_matches_single_process(tmp_path):
    """DP training across 2 processes (grad all-reduce over the
    jax.distributed transport) must produce the same params as a
    single-process step over the full global batch."""
    import jax
    import jax.numpy as jnp
    import optax

    from compression_tpu.models import bls2017
    from compression_tpu.parallel import sharding as sh

    port = _free_port()
    out = str(tmp_path / "trained.npz")
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": os.path.dirname(os.path.dirname(_WORKER)),
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, f"127.0.0.1:{port}", "2", str(pid),
             out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outputs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    data = np.load(out)

    # Reproduce the same 2 training steps single-process.
    model = bls2017.BLS2017Model(lmbda=0.01, num_filters=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), training=False)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    mesh = sh.make_mesh(1, data_axis=1)
    step = sh.data_parallel_train_step(
        mesh, bls2017.make_train_step(model, optimizer))
    key = jax.random.PRNGKey(7)
    batch = jnp.asarray(data["batch"])
    for _ in range(2):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub)

    flat, _ = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(flat):
        np.testing.assert_allclose(
            np.asarray(leaf), data[f"param_{i}"], rtol=1e-5, atol=1e-6,
            err_msg=f"param leaf {i} diverged between 1- and 2-process DP")
