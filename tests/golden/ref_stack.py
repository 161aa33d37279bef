"""Imports the REFERENCE Python entropy-model stack from its read-only
mount, unmodified, as a golden oracle.

Two injections make this possible in this image:
  * `tensorflow_probability` -> tfp_shim (the image has no TFP),
  * `tensorflow_compression.python.ops.gen_ops` -> the reference C++
    kernels compiled unmodified into ref_ops.so (build_ref_ops.sh); the
    reference loader expects a bazel-built .so inside the (read-only)
    mount, so the module object is pre-registered instead.

Everything else — helpers.estimate_tails, DeepFactorized,
UniformNoiseAdapter, ContinuousBatched/Indexed entropy models, the
PackedTensors container — executes the reference source verbatim.

Test harness only; nothing here ships in the compression_tpu package.
"""

import os
import sys
import types

_REF = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_ref_ops():
    """Returns the path to ref_ops.so, building it on demand.

    The .so is a gitignored build artifact (reference C++ kernels
    compiled unmodified by build_ref_ops.sh), so a fresh checkout
    doesn't have it; every loader goes through here instead of
    assuming the file exists."""
    so_path = os.path.join(_HERE, "ref_ops.so")
    if not os.path.exists(so_path):
        import subprocess
        subprocess.run(
            ["bash", os.path.join(_HERE, "build_ref_ops.sh")],
            check=True, capture_output=True, timeout=600)
    return so_path


def load():
    """Returns a namespace with the reference modules loaded."""
    sys.path.insert(0, _HERE)
    import tensorflow as tf  # noqa: E402
    import tfp_shim  # noqa: E402

    sys.modules.setdefault("tensorflow_probability", tfp_shim)

    # The reference writes `tf.constant(..., dtype=int)` (valid on the TF
    # it was developed against, where as_dtype fell back to np.dtype).
    # TF 2.21 rejects bare Python types; restore the old fallback so the
    # reference source runs unmodified.
    from tensorflow.python.framework import dtypes as _dtypes  # noqa: E402
    import numpy as _np  # noqa: E402
    if not getattr(_dtypes.as_dtype, "_ref_stack_patched", False):
        _orig_as_dtype = _dtypes.as_dtype

        def _as_dtype(type_value):
            if any(type_value is t for t in (int, float, bool, complex)):
                return _orig_as_dtype(_np.dtype(type_value))
            return _orig_as_dtype(type_value)

        _as_dtype._ref_stack_patched = True
        _dtypes.as_dtype = _as_dtype

    def make_pkg(name, path):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__path__ = [path]
        m.__package__ = name
        sys.modules[name] = m
        return m

    base = os.path.join(_REF, "tensorflow_compression")
    make_pkg("tensorflow_compression", base)
    make_pkg("tensorflow_compression.python", os.path.join(base, "python"))
    for sub in ("ops", "distributions", "entropy_models", "util"):
        make_pkg(f"tensorflow_compression.python.{sub}",
                 os.path.join(base, "python", sub))

    # The reference gen_ops.py load_op_library()s a bazel-built .so path
    # inside the read-only mount; register the module backed by ref_ops.so
    # (same sources, compiled by build_ref_ops.sh) before anything
    # imports it.
    name = "tensorflow_compression.python.ops.gen_ops"
    if name not in sys.modules:
        ops = tf.load_op_library(ensure_ref_ops())
        gen_ops = types.ModuleType(name)
        for n in dir(ops):
            if not n.startswith("_"):
                setattr(gen_ops, n, getattr(ops, n))
        sys.modules[name] = gen_ops

    import tensorflow_compression.python.ops.gen_ops as gen_ops  # noqa
    import tensorflow_compression.python.ops.math_ops as math_ops  # noqa
    import tensorflow_compression.python.ops.round_ops as round_ops  # noqa
    import tensorflow_compression.python.distributions.helpers as helpers  # noqa
    import tensorflow_compression.python.distributions.uniform_noise as uniform_noise  # noqa
    import tensorflow_compression.python.distributions.deep_factorized as deep_factorized  # noqa
    import tensorflow_compression.python.entropy_models.continuous_base as continuous_base  # noqa
    import tensorflow_compression.python.entropy_models.continuous_batched as continuous_batched  # noqa
    import tensorflow_compression.python.entropy_models.continuous_indexed as continuous_indexed  # noqa
    import tensorflow_compression.python.entropy_models.universal as universal  # noqa
    import tensorflow_compression.python.util.packed_tensors as packed_tensors  # noqa

    ns = types.SimpleNamespace(
        tf=tf, tfp=tfp_shim, gen_ops=gen_ops, math_ops=math_ops,
        round_ops=round_ops, helpers=helpers, uniform_noise=uniform_noise,
        deep_factorized=deep_factorized, continuous_base=continuous_base,
        continuous_batched=continuous_batched,
        continuous_indexed=continuous_indexed, universal=universal,
        packed_tensors=packed_tensors)
    return ns


def load_layers(ns=None):
    """Additionally imports the reference Keras layers (GDN, SignalConv,
    parameters, initializers) from the mount.  They build and run under
    the in-image Keras 3 (verified); only their variables are reached
    through the Parameter objects rather than Keras tracking."""
    if ns is None:
        ns = load()
    base = os.path.join(_REF, "tensorflow_compression")
    name = "tensorflow_compression.python.layers"
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [os.path.join(base, "python", "layers")]
        m.__package__ = name
        sys.modules[name] = m
    import tensorflow_compression.python.layers.parameters as parameters  # noqa
    import tensorflow_compression.python.layers.initializers as initializers  # noqa
    import tensorflow_compression.python.layers.gdn as gdn  # noqa
    import tensorflow_compression.python.layers.signal_conv as signal_conv  # noqa
    ns.parameters = parameters
    ns.initializers = initializers
    ns.gdn = gdn
    ns.signal_conv = signal_conv
    return ns
