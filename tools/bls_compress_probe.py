"""Wall-clock decomposition of bls2017 compress_native (VERDICT r4
item 2: the one losing cell).  Splits the ~2-RTT pipeline into:

  upload     — jnp.asarray(x) + block (uint8 image host->device)
  dispatch   — analysis + encode submissions (async, no fetch)
  fetch      — np.asarray(flat) (packed int32 device->host)
  finalize   — host container assembly (to_bytes_list + PackedTensors)

and compares against the end-to-end compress_native wall and the
reference stack's recorded 51.5 ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from compression_tpu.util import compile_cache
    compile_cache.enable()
    from tools.model_bench import _build

    codec = _build("bls2017", 512)
    rng = np.random.RandomState(7)
    x8 = rng.randint(0, 256, (512, 512, 3)).astype(np.uint8)

    # Warm everything.
    container = codec.compress_native(x8)
    print(f"container bytes: {len(container)}")

    reps = int(os.environ.get("REPS", "7"))

    def stat(ts):
        ts = np.asarray(ts) * 1e3
        return (f"median {np.median(ts):6.1f}  min {ts.min():6.1f}  "
                f"max {ts.max():6.1f} ms")

    # End-to-end.
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        codec.compress_native(x8)
        ts.append(time.perf_counter() - t0)
    print("end-to-end compress_native:", stat(ts))

    # Phase split.
    ups, dispatches, fetches, finals = [], [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        xd = jnp.asarray(x8)[None]
        jax.block_until_ready(xd)
        t1 = time.perf_counter()
        y = codec._analysis(codec.params, xd)
        fn, spec, geom, n = codec._native_encoders[y.shape]
        flat = fn(y)
        t2 = time.perf_counter()
        flat_h = np.asarray(flat)
        t3 = time.perf_counter()
        codec._native_finalize(flat_h, (spec, geom, n, x8.shape[:2]), x8)
        t4 = time.perf_counter()
        ups.append(t1 - t0)
        dispatches.append(t2 - t1)
        fetches.append(t3 - t2)
        finals.append(t4 - t3)
    print("upload (blocked):          ", stat(ups))
    print("dispatch (async submits):  ", stat(dispatches))
    print("fetch (packed int32):      ", stat(fetches))
    print("finalize (host container): ", stat(finals))

    # What does the fetch carry?
    fn, spec, geom, n = codec._native_encoders[
        next(iter(codec._native_encoders))]
    words = sum(int(np.prod(s)) if k != "u8" else (int(np.prod(s)) + 3) // 4
                for s, k in spec)
    print(f"fetch payload: {words * 4} bytes  spec={spec}")

    # Pure upload cost at this size, and pure fetch cost of a same-size
    # dummy, for reference.
    up2, rt2 = [], []
    dummy = jnp.zeros((words,), jnp.int32) + 1
    jax.block_until_ready(dummy)
    for _ in range(reps):
        t0 = time.perf_counter()
        a = jnp.asarray(x8)
        jax.block_until_ready(a)
        up2.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(dummy)
        rt2.append(time.perf_counter() - t0)
    print("bare image upload:         ", stat(up2))
    print("bare same-size fetch:      ", stat(rt2))


if __name__ == "__main__":
    main()
