"""Tunnel-free decomposition of the native model codec paths (VERDICT r3
item 4).

For each family at 512x512 this measures, with the device-side k-loop
(tools/device_time.py methodology — chained iterations inside one jitted
program, differenced over two k values so per-dispatch tunnel latency
cancels):

  * transform device ms (analysis / synthesis, the MXU work),
  * coding device ms (the sidecar encode and decode programs at the
    model's actual stream geometry),
  * conditioning device ms (ms2020: per-slice mu/sigma/LRP convs),
  * end-to-end wall ms of the native path (user-experienced), and the
    implied tunnel+host share = wall - device.

It also reports effective coder symbols/s at model geometry next to the
32k-stream micro-bench number, so the stream-count gap is explicit.

Writes docs/native_decomp.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np


def _chain(t, acc):
    import jax.numpy as jnp

    bump = jnp.where(acc.reshape(-1)[:1] == jnp.int32(-2147483647), 1, 0)
    return t + bump.astype(t.dtype)


def devms(fn_k, k_lo=1, k_hi=17, reps=3):
    ts = []
    np.asarray(fn_k(k_hi))
    np.asarray(fn_k(k_lo))
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn_k(k_hi))
        th = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fn_k(k_lo))
        tl = time.perf_counter() - t0
        ts.append((th - tl) / (k_hi - k_lo))
    return round(max(float(np.median(ts)), 0.0) * 1e3, 3)


def kloop(fn, probe):
    """Wraps fn (device arrays -> device arrays) in a chained k-loop.

    probe(out) must return an int32-convertible scalar data-dependency.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(args, k):
        def body(i, acc):
            out = fn(*[_chain(a, acc) if a.dtype != jnp.bool_ else a
                       for a in args])
            return acc + probe(out).reshape((1,)).astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((1,), jnp.int32))

    return run


def wall_ms(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return {"median": round(float(np.median(ts)) * 1e3, 1),
            "min": round(min(ts) * 1e3, 1),
            "max": round(max(ts) * 1e3, 1)}


def decompose(name, size=512):
    import jax
    import jax.numpy as jnp
    from compression_tpu.util import compile_cache
    compile_cache.enable()

    from compression_tpu.codec import jax_coder as jc
    from compression_tpu.models import native_format
    from tools.model_bench import _build, _transform_times

    codec = _build(name, size)
    rng = np.random.RandomState(7)
    x8 = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
    out = {"image": f"{size}x{size}"}

    container = codec.compress_native(x8)
    out["wall_native_compress_ms"] = wall_ms(
        lambda: codec.compress_native(x8))
    out["wall_native_decompress_ms"] = wall_ms(
        lambda: codec.decompress(container))
    out["transform"] = _transform_times(codec, x8)

    x = jnp.asarray(x8)[None]
    if name == "ms2020":
        y, z = codec._encode(codec.params, x)
        y_shape = tuple(int(s) for s in y.shape[1:-1])
        enc_z, enc_slice, _, _, geom = codec._native_coders(
            y.shape, z.shape)
        (hy, wy, cs), n_y, (hz, wz, cz), n_z = geom[:4]
        z_hat = codec.em_z.quantize(z)
        ls, lm = codec._hyper_decode(codec.params, z_hat)
        mu, sigma, _ = codec._slice_params(
            codec.params, 0, lm, ls, (), y_shape)
        ns = codec.model.num_slices
        y_slice = jnp.split(y, ns, axis=-1)[0]

        enc_z_ms = devms(lambda k: kloop(
            lambda zz: enc_z(zz), lambda o: o[1].reshape(-1)[:1])(
                (z,), k))
        # All slices code in ONE wide call since round 4 (replicating
        # slice-0's conditioning is timing-equivalent: same geometry).
        enc_s_ms = devms(lambda k: kloop(
            lambda yy, ss, mm: enc_slice(
                [yy] * ns, [ss] * ns, [mm] * ns),
            lambda o: o[1].reshape(-1)[:1])((y_slice, sigma, mu), k))
        out["coder_encode_device_ms"] = round(enc_z_ms + enc_s_ms, 3)
        # Conditioning: one slice_params + lrp pass x num_slices.
        cond_ms = devms(lambda k: kloop(
            lambda lmm, lss: codec.model.apply(
                codec.params, 0, lmm, lss, (), y_shape,
                method=type(codec.model).slice_params)[0],
            lambda o: o.reshape(-1)[:1])((lm, ls), k))
        out["conditioning_per_slice_ms"] = cond_ms
        out["conditioning_device_ms"] = round(2 * ns * cond_ms, 3)
        n_symbols = (int(np.prod(z.shape)) + int(np.prod(y.shape)))
        coder_ms = out["coder_encode_device_ms"]
    else:
        if name == "bls2017":
            y = codec._analysis(codec.params, x)
            fn, spec, (h, w, c), n = codec._native_encoders[y.shape]
            enc_ms = devms(lambda k: kloop(
                lambda yy: fn(yy), lambda o: o.reshape(-1)[:1])((y,), k))
            n_symbols = int(np.prod(y.shape))
        else:
            y, z = codec._encode(codec.params, x)
            z_hat = codec.side_em.quantize(z)
            idx = codec._hyper_decode(codec.params, z_hat)
            idx = idx[:, : y.shape[1], : y.shape[2], :]
            fn = codec._native_encoders[(y.shape, z.shape)][0]
            enc_ms = devms(lambda k: kloop(
                lambda yy, ii, zz: fn(yy, ii, zz),
                lambda o: o.reshape(-1)[:1])((y, idx, z), k))
            n_symbols = int(np.prod(y.shape)) + int(np.prod(z.shape))
        out["coder_encode_device_ms"] = enc_ms
        coder_ms = enc_ms

    out["n_symbols"] = n_symbols
    out["coder_encode_msym_per_s"] = round(
        n_symbols / max(coder_ms, 1e-6) / 1e3, 1)
    dev_total = (out["transform"]["analysis_ms"]
                 + out.get("conditioning_device_ms", 0.0)
                 + out["coder_encode_device_ms"])
    out["compress_device_total_ms"] = round(dev_total, 2)
    out["compress_tunnel_host_ms"] = round(
        out["wall_native_compress_ms"]["median"] - dev_total, 1)
    return out


def main():
    results = {}
    for name in ("bls2017", "bmshj2018", "ms2020"):
        t0 = time.time()
        try:
            results[name] = decompose(name)
            results[name]["tool_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"{name}: {results[name]}", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "native_decomp.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
