"""Generates golden range-coder bitstreams using the reference C++ coder.

Runs the gen_golden oracle (compiled from the read-only reference mount) on a
battery of symbol sequences, verifies this repo's Python reference coder
produces byte-identical output, and stores the fixtures in golden.npz.

Usage: python make_golden.py   (from tests/golden/, after building gen_golden)
"""

import subprocess
import sys

import numpy as np

sys.path.insert(0, "../..")
from compression_tpu.codec import reference, tables  # noqa: E402


def cpp_encode(proc, ops):
    proc.stdin.write(f"E {len(ops)}\n")
    for lower, upper, precision in ops:
        proc.stdin.write(f"{lower} {upper} {precision}\n")
    proc.stdin.flush()
    h = proc.stdout.readline().strip()
    return b"" if h == "-" else bytes.fromhex(h)


def cpp_decode(proc, precision, data, cdf, n):
    h = data.hex() if data else "-"
    cdf_s = " ".join(str(int(c)) for c in cdf)
    proc.stdin.write(f"D {precision} {h} {len(cdf)} {cdf_s} {n}\n")
    proc.stdin.flush()
    symbols = [int(x) for x in proc.stdout.readline().split()]
    sanity = proc.stdout.readline().strip() == "ok"
    return symbols, sanity


def py_encode(ops):
    enc = reference.RangeEncoder()
    sink = bytearray()
    for lower, upper, precision in ops:
        enc.encode(lower, upper, precision, sink)
    enc.finalize(sink)
    return bytes(sink)


def make_cases():
    rng = np.random.RandomState(0)
    cases = []  # (name, ops, cdf or None, precision)

    # Uniform / skewed / Dirac alphabets at several precisions.
    for precision in [1, 2, 8, 12, 16]:
        alphabet = min(1 << precision, 64)
        for dist, name in [
            (np.ones(alphabet), "uniform"),
            (1.0 / (1 + np.arange(alphabet)) ** 1.5, "zipf"),
            (np.r_[1e-6 * np.ones(alphabet - 1), 1.0], "dirac"),
        ]:
            if alphabet < 2:
                continue
            pmf = dist / dist.sum()
            cdf = tables.pmf_to_quantized_cdf(pmf, precision)
            data = rng.randint(0, alphabet, size=3000)
            ops = [(int(cdf[v]), int(cdf[v + 1]), precision) for v in data]
            cases.append((f"{name}_p{precision}", ops, cdf, precision, data))

    # Binary streams at precision 16 — maximal delayed-carry churn.
    cdf = np.array([0, 1, 1 << 16], np.int32)
    data = (rng.rand(5000) < 0.5).astype(np.int64)
    ops = [(int(cdf[v]), int(cdf[v + 1]), 16) for v in data]
    cases.append(("carry_p16", ops, cdf, 16, data))

    # Mixed precision per step (encoder-only golden; no single-cdf decode).
    data = rng.randint(0, 4, size=2000)
    cdf4 = tables.pmf_to_quantized_cdf(np.full(4, 0.25), 4)
    cdf16 = tables.pmf_to_quantized_cdf(np.array([.7, .1, .1, .1]), 16)
    ops = [
        (int((cdf4 if j % 2 else cdf16)[v]),
         int((cdf4 if j % 2 else cdf16)[v + 1]), 4 if j % 2 else 16)
        for j, v in enumerate(data)
    ]
    cases.append(("mixed_prec", ops, None, 0, data))

    # Short streams exercising every Finalize branch.
    for n in [0, 1, 2, 3, 5, 17]:
        pmf = rng.dirichlet(np.ones(8))
        cdf = tables.pmf_to_quantized_cdf(pmf, 12)
        data = rng.randint(0, 8, size=n)
        ops = [(int(cdf[v]), int(cdf[v + 1]), 12) for v in data]
        cases.append((f"short_{n}", ops, cdf, 12, data))

    return cases


def main():
    proc = subprocess.Popen(
        ["./gen_golden"], stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        text=True)
    out = {}
    n_ok = 0
    for name, ops, cdf, precision, data in make_cases():
        cpp_bytes = cpp_encode(proc, ops)
        py_bytes = py_encode(ops)
        assert cpp_bytes == py_bytes, (
            f"{name}: python reference disagrees with C++ oracle "
            f"({py_bytes[:16].hex()} vs {cpp_bytes[:16].hex()})")
        if cdf is not None:
            symbols, sanity = cpp_decode(proc, precision, cpp_bytes, cdf,
                                         len(data))
            assert symbols == list(data), f"{name}: C++ decode mismatch"
            assert sanity, f"{name}: C++ sanity check failed"
        out[f"{name}__bytes"] = np.frombuffer(cpp_bytes, np.uint8)
        out[f"{name}__data"] = np.asarray(data, np.int32)
        if cdf is not None:
            out[f"{name}__cdf"] = np.asarray(cdf, np.int32)
            out[f"{name}__precision"] = np.int32(precision)
        n_ok += 1
    proc.stdin.write("Q\n")
    proc.stdin.flush()
    np.savez_compressed("golden.npz", **out)
    print(f"{n_ok} golden cases verified (python == C++ oracle), saved.")


if __name__ == "__main__":
    main()
