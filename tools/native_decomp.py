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

        run_ez = kloop(lambda zz: enc_z(zz),
                       lambda o: o[1].reshape(-1)[:1])
        enc_z_ms = devms(lambda k: run_ez((z,), k))
        # All slices code in ONE wide call since round 4 (replicating
        # slice-0's conditioning is timing-equivalent: same geometry).
        run_es = kloop(lambda yy, ss, mm: enc_slice(
            [yy] * ns, [ss] * ns, [mm] * ns),
            lambda o: o[1].reshape(-1)[:1])
        enc_s_ms = devms(lambda k: run_es((y_slice, sigma, mu), k))
        out["coder_encode_device_ms"] = round(enc_z_ms + enc_s_ms, 3)
        # Conditioning: one slice_params + lrp pass x num_slices.
        run_cond = kloop(
            lambda lmm, lss: codec.model.apply(
                codec.params, 0, lmm, lss, (), y_shape,
                method=type(codec.model).slice_params)[0],
            lambda o: o.reshape(-1)[:1])
        cond_ms = devms(lambda k: run_cond((lm, ls), k))
        out["conditioning_per_slice_ms"] = cond_ms
        out["conditioning_device_ms"] = round(2 * ns * cond_ms, 3)
        n_symbols = (int(np.prod(z.shape)) + int(np.prod(y.shape)))
        coder_ms = out["coder_encode_device_ms"]
    else:
        if name == "bls2017":
            y = codec._analysis(codec.params, x)
            fn, spec, (h, w, c), n = codec._native_encoders[y.shape]
            run_e = kloop(lambda yy: fn(yy),
                          lambda o: o.reshape(-1)[:1])
            enc_ms = devms(lambda k: run_e((y,), k))
            n_symbols = int(np.prod(y.shape))
        else:
            y, z = codec._encode(codec.params, x)
            z_hat = codec.side_em.quantize(z)
            idx = codec._hyper_decode(codec.params, z_hat)
            idx = idx[:, : y.shape[1], : y.shape[2], :]
            fn = codec._native_encoders[(y.shape, z.shape)][0]
            run_e = kloop(lambda yy, ii, zz: fn(yy, ii, zz),
                          lambda o: o.reshape(-1)[:1])
            enc_ms = devms(lambda k: run_e((y, idx, z), k))
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

    # ---- Decompress side (VERDICT r4 item 7): device decode terms +
    # the transfer payloads that ride the tunnel, so the wide wall-time
    # spread of native decompress is attributable.
    out["decode"] = _decompose_decode(codec, name, container, x8)
    dec = out["decode"]
    dec_total = (dec["coder_decode_device_ms"]
                 + out["transform"]["synthesis_ms"]
                 + out.get("conditioning_device_ms", 0.0))
    dec["decompress_device_total_ms"] = round(dec_total, 2)
    dec["decompress_tunnel_host_ms"] = round(
        out["wall_native_decompress_ms"]["median"] - dec_total, 1)
    return out


def _decompose_decode(codec, name, container, x8):
    """Device-side k-loop times of the native decode programs at model
    geometry, plus the tunnel payload sizes of one decompress call."""
    from compression_tpu.util.packed_tensors import PackedTensors

    out = {}
    # Tunnel payloads: container upload (packed int32 of raw bytes +
    # escape sidecar) and the uint8 image fetch.  The image fetch is the
    # dominant decode transfer (e.g. 786 KB at 512x512) — wall spread
    # tracks tunnel bandwidth on that term.
    out["container_bytes"] = len(container)
    out["image_fetch_bytes"] = int(np.prod(x8.shape))

    packed = PackedTensors(container)
    if name == "ms2020":
        sub = codec._native_dec_submit(packed)
        del sub
        key, fns = next(iter(codec._native_decoders.items()))
        dec_z, dec_slice = fns
        # Rebuild the packed upload exactly as _native_dec_submit does:
        # reuse its host-side parse by calling through once more and
        # timing the cached jits with representative inputs.
        flat = _ms2020_flat(codec, packed)
        run_z = kloop(lambda ff: dec_z(ff)[0],
                      lambda o: o.reshape(-1)[:1])
        z_ms = devms(lambda k: run_z((flat,), k))
        # One slice decode, scaled by num_slices (equal geometry).
        ns = codec.model.num_slices
        args = _ms2020_slice_args(codec, packed)
        run_s = kloop(lambda bb, ln, sig, mm, ei, ev: dec_slice(
            bb, ln, sig, mm, ei, ev)[0],
            lambda o: o.reshape(-1)[:1])
        s_ms = devms(lambda k: run_s(args, k))
        out["z_decode_device_ms"] = z_ms
        out["slice_decode_device_ms"] = s_ms
        out["coder_decode_device_ms"] = round(z_ms + ns * s_ms, 3)
    else:
        # bls/bmshj: the cached decode jits take one packed flat input
        # (bls) or flat + index chain (bmshj); time the main stream
        # decode program.
        if name == "bls2017":
            x_hat, sanity, x_hw = codec._native_dec_submit(packed)
            del x_hat, sanity, x_hw
            fn = next(iter(codec._native_decoders.values()))
            flat = _bls_flat(codec, packed)
            run = kloop(lambda ff: fn(ff)[0],
                        lambda o: o.reshape(-1)[:1])
            out["coder_decode_device_ms"] = devms(
                lambda k: run((flat,), k))
        else:
            sub = codec._native_dec_submit(packed)
            del sub
            dec_z, dec_y = next(iter(codec._native_decoders.values()))
            flat = _bmshj_flat(codec, packed)
            run_z = kloop(lambda ff: dec_z(ff)[0],
                          lambda o: o.reshape(-1)[:1])
            z_ms = devms(lambda k: run_z((flat,), k))
            args = _bmshj_y_args(codec, packed)
            run_y = kloop(lambda idx, bb, ln, ei, ev: dec_y(
                idx, bb, ln, ei, ev)[0],
                lambda o: o.reshape(-1)[:1])
            y_ms = devms(lambda k: run_y(args, k))
            out["z_decode_device_ms"] = z_ms
            out["y_decode_device_ms"] = y_ms
            out["coder_decode_device_ms"] = round(z_ms + y_ms, 3)
    return out


def _bls_flat(codec, packed):
    import jax.numpy as jnp

    from compression_tpu.codec import jax_coder as jc
    from compression_tpu.models import native_format
    from compression_tpu.util import transfer as tr

    strings, x_shape, y_shape, esc_flat, esc_val = packed.unpack(
        ["bytes", np.int32, np.int32, np.int32, np.int32])
    buf, lens = jc.from_bytes_list(strings)
    h, w = int(y_shape[0]), int(y_shape[1])
    c = int(np.prod(codec.em.prior_shape))
    k = native_format.split_factor_from_streams(len(strings), h)
    n = (w // k) * c
    if buf.shape[1] % 2:
        buf = np.pad(buf, ((0, 0), (0, 1)))
    ei, ev = jc.sidecar_pad(
        esc_flat.reshape(-1, 2), esc_val, n, len(strings) * n)
    return jnp.asarray(tr.pack_host(
        [buf, lens.astype(np.int32), ei, ev]))


def _bmshj_flat(codec, packed):
    import jax.numpy as jnp

    from compression_tpu.codec import jax_coder as jc
    from compression_tpu.models import native_format
    from compression_tpu.util import transfer as tr

    (strings, side_strings, x_shape, y_shape, z_shape, y_ep, y_ev,
     z_ep, z_ev) = packed.unpack(
        ["bytes", "bytes", np.int32, np.int32, np.int32,
         np.int32, np.int32, np.int32, np.int32])
    hy, wy = int(y_shape[0]), int(y_shape[1])
    hz, wz = int(z_shape[0]), int(z_shape[1])
    cz = int(np.prod(codec.side_em.prior_shape))
    k_z = native_format.split_factor_from_streams(len(side_strings), hz)
    k_y = native_format.split_factor_from_streams(len(strings), hy)
    z_buf, z_len = jc.from_bytes_list(side_strings)
    y_buf, y_len = jc.from_bytes_list(strings)
    if z_buf.shape[1] % 2:
        z_buf = np.pad(z_buf, ((0, 0), (0, 1)))
    if y_buf.shape[1] % 2:
        y_buf = np.pad(y_buf, ((0, 0), (0, 1)))
    n_z = (wz // k_z) * cz
    z_ei, z_evp = jc.sidecar_pad(
        z_ep.reshape(-1, 2), z_ev, n_z, len(side_strings) * n_z)
    cy = codec.latent_depth
    n_y = (wy // k_y) * cy
    y_ei, y_evp = jc.sidecar_pad(
        y_ep.reshape(-1, 2), y_ev, n_y, len(strings) * n_y)
    return jnp.asarray(tr.pack_host(
        [z_buf, z_len.astype(np.int32), z_ei, z_evp,
         y_buf, y_len.astype(np.int32), y_ei, y_evp]))


def _bmshj_y_args(codec, packed):
    dec_z, _ = next(iter(codec._native_decoders.values()))
    flat = _bmshj_flat(codec, packed)
    z_hat, z_san, y_bb, y_lnd, y_eid, y_evd = dec_z(flat)
    indexes = codec._hyper_decode(codec.params, z_hat)
    y_shape = packed.unpack(
        ["bytes", "bytes", np.int32, np.int32])[3]
    indexes = indexes[:, : int(y_shape[0]), : int(y_shape[1]), :]
    return (indexes, y_bb, y_lnd, y_eid, y_evd)


def _ms2020_flat(codec, packed):
    """Reconstructs the packed decode upload for the cached dec_z jit."""
    import jax.numpy as jnp

    from compression_tpu.codec import jax_coder as jc
    from compression_tpu.models import native_format
    from compression_tpu.util import transfer as tr

    ns = codec.model.num_slices
    fields = packed.unpack(
        [np.int32, np.int32, np.int32, "bytes", np.int32, np.int32]
        + ["bytes", np.int32, np.int32] * ns)
    x_shape, y_shape, z_shape = fields[:3]
    z_strings, z_ep, z_ev = fields[3:6]
    hy, wy = int(y_shape[0]), int(y_shape[1])
    hz, wz = int(z_shape[0]), int(z_shape[1])
    cz = int(np.prod(codec.em_z.prior_shape))
    cs = int(codec.model.latent_depth) // ns
    k_z = native_format.split_factor_from_streams(len(list(z_strings)), hz)
    z_buf, z_len = jc.from_bytes_list(list(z_strings))
    if z_buf.shape[1] % 2:
        z_buf = np.pad(z_buf, ((0, 0), (0, 1)))
    n_z = (wz // k_z) * cz
    z_ei, z_evp = jc.sidecar_pad(
        z_ep.reshape(-1, 2), z_ev, n_z, z_buf.shape[0] * n_z)
    slice_strings = [list(fields[6 + 3 * i]) for i in range(ns)]
    k_y = native_format.split_factor_from_streams(len(slice_strings[0]), hy)
    n_y = (wy // k_y) * cs
    s_y = len(slice_strings[0])
    bufs, lens = zip(*(jc.from_bytes_list(s) for s in slice_strings))
    width = max(b.shape[1] for b in bufs)
    width += width % 2
    max_esc = max(fields[7 + 3 * i].size // 2 for i in range(ns))
    y_b8 = np.stack([
        np.pad(b, ((0, 0), (0, width - b.shape[1]))) for b in bufs])
    y_lens = np.stack(lens).astype(np.int32)
    esc = [jc.sidecar_pad(fields[7 + 3 * i].reshape(-1, 2),
                          fields[8 + 3 * i], n_y, s_y * n_y,
                          bucket=max(1024, max_esc))
           for i in range(ns)]
    y_ei = np.stack([e[0] for e in esc])
    y_evp = np.stack([e[1] for e in esc])
    return jnp.asarray(tr.pack_host(
        [z_buf, z_len.astype(np.int32), z_ei, z_evp, y_b8, y_lens,
         y_ei, y_evp]))


def _ms2020_slice_args(codec, packed):
    dec_z, _ = next(iter(codec._native_decoders.values()))
    flat = _ms2020_flat(codec, packed)
    z_hat, z_san, y_bbd, y_lnd, y_eid, y_evd = dec_z(flat)
    ls, lm = codec._hyper_decode(codec.params, z_hat)
    fields = packed.unpack([np.int32, np.int32, np.int32])
    y_shape = (int(fields[1][0]), int(fields[1][1]))
    mu, sigma, _ = codec._slice_params(
        codec.params, 0, lm, ls, (), y_shape)
    return (y_bbd[0], y_lnd[0], sigma, mu, y_eid[0], y_evd[0])


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
