"""Golden fixtures for the StochasticRound xoshiro256+ stream.

Drives the REFERENCE StochasticRound kernel (ref_ops.so) over seeded
cases and stores inputs/outputs so tests can pin the bit-exact PRNG
stream without TF.  Reference: cc/kernels/quantization_kernels.cc:35-95.

Usage: python make_golden_quant.py  (after build_ref_ops.sh)
"""

import sys

import numpy as np
import tensorflow as tf

sys.path.insert(0, "../..")

ops = tf.load_op_library("./ref_ops.so")


def main():
    rng = np.random.RandomState(123)
    out = {}
    cases = [
        ("a", [3, 4], "f32", 257, 1.0),
        ("b", [1], "f32", 64, 0.37),
        ("c", [0, 0, 0], "f32", 500, 2.5),
        ("d", [-5, 123456, 7], "f32", 33, 0.11),
        ("e", [7, 8], "bf16", 128, 1.0),
        ("f", [9], "f16", 128, 0.75),
    ]
    names = []
    for name, seed, dt, n, step in cases:
        x32 = rng.normal(0, 5, n).astype(np.float32)
        if dt == "bf16":
            xt = tf.cast(x32, tf.bfloat16)
        elif dt == "f16":
            xt = tf.cast(x32, tf.float16)
        else:
            xt = tf.constant(x32)
        ref = ops.stochastic_round(
            xt, np.float32(step), seed=np.asarray(seed, np.int32)).numpy()
        out[f"{name}__x"] = x32
        out[f"{name}__dtype"] = np.bytes_(dt)
        out[f"{name}__seed"] = np.asarray(seed, np.int32)
        out[f"{name}__step"] = np.float32(step)
        out[f"{name}__out"] = ref
        names.append(name)
    out["cases"] = np.asarray(names, dtype="S8")
    np.savez_compressed("golden_quant.npz", **out)
    print(f"saved golden_quant.npz ({len(cases)} cases)")


if __name__ == "__main__":
    main()
