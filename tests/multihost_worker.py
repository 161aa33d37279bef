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

    if pid == 0:
        np.savez(out_path, buf=buf_g, lengths=len_g, symbols=symbols,
                 ragged=np.asarray(ragged, np.int32))
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
