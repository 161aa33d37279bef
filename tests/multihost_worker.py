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

    # --- phase 1b: the FLAGSHIP sidecar coder path across processes --
    # Entropy-model tables build on process 0 ONLY and broadcast (the
    # decode-divergence contract, SURVEY hard part #4); every process
    # codes its local stream shard with the same traced EM sidecar
    # method the native containers dispatch; bytes and escape sidecars
    # gather in process order.
    from compression_tpu.distributions import deep_factorized, uniform_noise
    from compression_tpu.entropy_models import ContinuousBatchedEntropyModel

    def build_em_tables():
        prior = uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=deep_factorized.DeepFactorized.init_params(
                    jax.random.PRNGKey(3), (4,)),
                batch_shape=(4,)))
        em0 = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True,
            offset_heuristic=False)
        w = em0.get_weights()
        return np.asarray(w[0], np.int32), np.asarray(w[1], np.int32)

    if pid == 0:
        em_cdf, em_off = multihost.build_tables_replicated(build_em_tables)
    else:
        boom2 = lambda: (_ for _ in ()).throw(  # noqa: E731
            AssertionError("EM tables must only build on process 0"))
        em_cdf, em_off = multihost.build_tables_replicated(boom2)
    em = ContinuousBatchedEntropyModel.from_config(dict(
        coding_rank=3, compression=True, stateless=False,
        expected_grads=False, tail_mass=2 ** -8,
        cdf_shapes=(int(em_cdf.shape[0]), int(em_off.shape[0])),
        prior_shape=(4,), offset_heuristic=False,
        quantization_offset=False))
    em.set_weights([em_cdf, em_off])

    w_s, c_s = 8, 4
    rows_global = np.random.RandomState(11).normal(
        0, 2, size=(8, 1, w_s, c_s)).astype(np.float32)
    rows_global[0, 0, 0, 0] = 300.0  # escapes ride the sidecar
    n_elem = w_s * c_s
    per_s = rows_global.shape[0] // num_procs
    local_rows = rows_global[pid * per_s : (pid + 1) * per_s]

    import jax.numpy as _jnp
    sbuf, slen, s_ei, s_ev, s_cnt, s_ok = jax.jit(
        lambda r: em.compress_sidecar_device(r))(_jnp.asarray(local_rows))
    assert bool(s_ok)
    sbuf_g, slen_g = multihost.gather_bytes(
        np.asarray(sbuf), np.asarray(slen))
    # Escape sidecar: local flat positions -> global, gathered in
    # process order (variable-count: ship count + padded arrays).
    from jax.experimental import multihost_utils
    cnt_all = np.asarray(multihost_utils.process_allgather(
        np.asarray(s_cnt).reshape(1)))
    ei_all = np.asarray(multihost_utils.process_allgather(
        np.asarray(s_ei)[None]))
    ev_all = np.asarray(multihost_utils.process_allgather(
        np.asarray(s_ev)[None]))
    cnt_all = cnt_all.reshape(num_procs)
    ei_all = ei_all.reshape(num_procs, -1)
    ev_all = ev_all.reshape(num_procs, -1)
    g_pos, g_val = [], []
    for i in range(num_procs):
        c = int(cnt_all[i])
        g_pos.append(ei_all[i, :c] + i * per_s * n_elem)
        g_val.append(ev_all[i, :c])
    g_pos = np.concatenate(g_pos).astype(np.int64)
    g_val = np.concatenate(g_val).astype(np.int32)

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
                 sidecar_buf=sbuf_g, sidecar_lens=slen_g,
                 sidecar_rows=rows_global,
                 sidecar_esc_pos=g_pos, sidecar_esc_val=g_val,
                 em_cdf=em_cdf, em_off=em_off,
                 **{f"param_{i}": np.asarray(leaf)
                    for i, leaf in enumerate(flat)})
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
