"""Ports reference (tensorflow/compression) model weights to this repo.

The reference stores its weights in reparameterized form:
  * SignalConv kernels as real+imag RDFT coefficients with 1/sqrt(N)
    normalization (reference python/layers/parameters.py:71-173) —
    identical storage to this repo's `kernel_rdft` flax param (stacked
    [real, imag]), so values port verbatim;
  * GDN beta/gamma as sqrt(value + offset^2) "GDNParameter" variables
    (reference parameters.py:186-269) — identical to `reparam_beta` /
    `reparam_gamma`;
  * DeepFactorized priors as per-channel matrices/biases/factors
    (reference python/distributions/deep_factorized.py:114-147) —
    identical pytree layout.

Input is a flat {name: np.ndarray} dict (see `extract_*` helpers, which
pull the arrays out of live reference layer objects; any TF checkpoint
reader producing the same names works too).  Output is a flax params
pytree for the corresponding compression_tpu model.

Usage:
    vars = extract_bls2017(analysis_layers, synthesis_layers, prior)
    params = port_bls2017(vars)            # -> {"params": {...}}
    model = compression_tpu.models.bls2017.BLS2017Model(num_filters=N)
    y = model.apply(params, x, method=BLS2017Model.encode)
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "port_signal_conv",
    "port_gdn",
    "port_deep_factorized",
    "port_bls2017",
    "port_bmshj2018",
    "extract_signal_conv",
    "extract_gdn",
    "extract_deep_factorized",
    "extract_bls2017",
    "extract_bmshj2018",
]


def port_signal_conv(real, imag, bias=None):
    """RDFT real/imag (+ optional bias) -> flax SignalConv params."""
    out = {"kernel_rdft": np.stack(
        [np.asarray(real, np.float32), np.asarray(imag, np.float32)])}
    if bias is not None:
        out["bias"] = np.asarray(bias, np.float32)
    return out


def port_gdn(beta_variable, gamma_variable):
    """GDNParameter storage variables -> flax GDN params (same form)."""
    return {
        "reparam_beta": np.asarray(beta_variable, np.float32),
        "reparam_gamma": np.asarray(gamma_variable, np.float32),
    }


def port_deep_factorized(matrices, biases, factors):
    """DeepFactorized variable lists -> params pytree (same layout)."""
    return {
        "matrices": [np.asarray(m, np.float32) for m in matrices],
        "biases": [np.asarray(b, np.float32) for b in biases],
        "factors": [np.asarray(f, np.float32) for f in factors],
    }


def port_bls2017(tf_vars):
    """Flat reference-variable dict -> flax params for BLS2017Model.

    Expected keys (produced by `extract_bls2017`):
      {analysis,synthesis}/layer_{i}/rdft_{real,imag}, .../bias,
      analysis/gdn_{i}/{beta,gamma}, synthesis/igdn_{i}/{beta,gamma},
      prior/{matrix,bias}_{0..2}, prior/factor_{0..1}.
    """
    params = {"analysis": {}, "synthesis": {}}
    for side, gdn_name in (("analysis", "gdn"), ("synthesis", "igdn")):
        for i in range(3):
            key = f"{side}/layer_{i}"
            bias = tf_vars.get(f"{key}/bias")
            params[side][f"layer_{i}"] = port_signal_conv(
                tf_vars[f"{key}/rdft_real"], tf_vars[f"{key}/rdft_imag"],
                bias)
        for i in range(2):
            key = f"{side}/{gdn_name}_{i}"
            params[side][f"{gdn_name}_{i}"] = port_gdn(
                tf_vars[f"{key}/beta"], tf_vars[f"{key}/gamma"])
    n_layers = len([k for k in tf_vars if k.startswith("prior/matrix_")])
    params["prior"] = port_deep_factorized(
        [tf_vars[f"prior/matrix_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/bias_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/factor_{i}"] for i in range(n_layers - 1)])
    return {"params": params}


def _port_conv_entry(tf_vars, key):
    """One SignalConv from flat vars: rdft (real/imag) or plain kernel."""
    if f"{key}/rdft_real" in tf_vars:
        return port_signal_conv(
            tf_vars[f"{key}/rdft_real"], tf_vars[f"{key}/rdft_imag"],
            tf_vars.get(f"{key}/bias"))
    out = {"kernel": np.asarray(tf_vars[f"{key}/kernel"], np.float32)}
    if f"{key}/bias" in tf_vars:
        out["bias"] = np.asarray(tf_vars[f"{key}/bias"], np.float32)
    return out


def port_bmshj2018(tf_vars):
    """Flat reference-variable dict -> flax params for BMSHJ2018Model.

    Reference architecture models/bmshj2018.py:52-139: 4-layer analysis/
    synthesis with (I)GDN, 3-layer hyper transforms (hyper-synthesis
    kernels stored as plain variables, not RDFT), DeepFactorized
    hyperprior.
    """
    params = {}
    for side, n_conv, gdn_name in (("analysis", 4, "gdn"),
                                   ("synthesis", 4, "igdn")):
        sub = {}
        for i in range(n_conv):
            sub[f"layer_{i}"] = _port_conv_entry(tf_vars, f"{side}/layer_{i}")
        for i in range(n_conv - 1):
            key = f"{side}/{gdn_name}_{i}"
            sub[f"{gdn_name}_{i}"] = port_gdn(
                tf_vars[f"{key}/beta"], tf_vars[f"{key}/gamma"])
        params[side] = sub
    for side in ("hyper_analysis", "hyper_synthesis"):
        params[side] = {
            f"layer_{i}": _port_conv_entry(tf_vars, f"{side}/layer_{i}")
            for i in range(3)}
    n_layers = len([k for k in tf_vars if k.startswith("prior/matrix_")])
    # The flax param slot is named "hyperprior" in BMSHJ2018Model.setup.
    params["hyperprior"] = port_deep_factorized(
        [tf_vars[f"prior/matrix_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/bias_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/factor_{i}"] for i in range(n_layers - 1)])
    return {"params": params}


def extract_conv_stack(tf_vars, side, convs, gdn_name=None):
    """Flattens a list of reference SignalConv layers (+GDN activations)
    into `tf_vars` under `{side}/layer_{i}` (+ `{side}/{gdn}_{i}`)."""
    for i, conv in enumerate(convs):
        kp = conv.kernel_parameter
        if hasattr(kp, "real"):  # RDFTParameter
            tf_vars[f"{side}/layer_{i}/rdft_real"] = kp.real.numpy()
            tf_vars[f"{side}/layer_{i}/rdft_imag"] = kp.imag.numpy()
        else:  # plain tf.Variable kernel
            tf_vars[f"{side}/layer_{i}/kernel"] = kp.numpy()
        bp = getattr(conv, "bias_parameter", None)
        if bp is not None and hasattr(bp, "numpy"):
            tf_vars[f"{side}/layer_{i}/bias"] = bp.numpy()
    if gdn_name is not None:
        gdns = [c.activation for c in convs
                if hasattr(c.activation, "beta_parameter")]
        for i, g in enumerate(gdns):
            tf_vars[f"{side}/{gdn_name}_{i}/beta"] = \
                g.beta_parameter.variable.numpy()
            tf_vars[f"{side}/{gdn_name}_{i}/gamma"] = \
                g.gamma_parameter.variable.numpy()
    return tf_vars


def extract_bmshj2018(analysis, synthesis, hyper_analysis, hyper_synthesis,
                      prior_base):
    tf_vars = {}
    extract_conv_stack(tf_vars, "analysis", analysis, "gdn")
    extract_conv_stack(tf_vars, "synthesis", synthesis, "igdn")
    extract_conv_stack(tf_vars, "hyper_analysis", hyper_analysis)
    extract_conv_stack(tf_vars, "hyper_synthesis", hyper_synthesis)
    for k, v in extract_deep_factorized(prior_base).items():
        tf_vars[f"prior/{k}"] = v
    return tf_vars


# --- extraction from live reference layer objects (TF side) -------------


def extract_signal_conv(layer):
    """Pulls RDFT real/imag and bias arrays out of a reference
    SignalConv layer (reference signal_conv.py kernel_parameter)."""
    kp = layer.kernel_parameter
    out = {"rdft_real": kp.real.numpy(), "rdft_imag": kp.imag.numpy()}
    bp = getattr(layer, "bias_parameter", None)
    if bp is not None and hasattr(bp, "numpy"):
        out["bias"] = bp.numpy()
    return out


def extract_gdn(layer):
    """Pulls GDNParameter storage variables out of a reference GDN."""
    return {
        "beta": layer.beta_parameter.variable.numpy(),
        "gamma": layer.gamma_parameter.variable.numpy(),
    }


def extract_deep_factorized(df):
    out = {}
    for i, m in enumerate(df._matrices):
        out[f"matrix_{i}"] = m.numpy()
    for i, b in enumerate(df._biases):
        out[f"bias_{i}"] = b.numpy()
    for i, f in enumerate(df._factors):
        out[f"factor_{i}"] = f.numpy()
    return out


def extract_bls2017(analysis_convs, synthesis_convs, prior_base):
    """Flattens a reference bls2017 (3 analysis convs with GDN
    activations, 3 synthesis convs with IGDN, DeepFactorized prior)
    into the dict `port_bls2017` expects."""
    tf_vars = {}
    for side, convs, gdn_name in (("analysis", analysis_convs, "gdn"),
                                  ("synthesis", synthesis_convs, "igdn")):
        for i, conv in enumerate(convs):
            for k, v in extract_signal_conv(conv).items():
                tf_vars[f"{side}/layer_{i}/{k}"] = v
        # Keras's activations.get(None) yields the `linear` function, so
        # detect GDN activations by their parameter attribute.
        gdns = [c.activation for c in convs
                if hasattr(c.activation, "beta_parameter")]
        for i, g in enumerate(gdns):
            for k, v in extract_gdn(g).items():
                tf_vars[f"{side}/{gdn_name}_{i}/{k}"] = v
    for k, v in extract_deep_factorized(prior_base).items():
        tf_vars[f"prior/{k}"] = v
    return tf_vars


def port_ms2020(tf_vars, num_slices=10):
    """Flat reference-variable dict -> flax params for MS2020Model.

    Reference architecture models/ms2020.py:54-161: 4-layer analysis/
    synthesis with (I)GDN, 3-layer hyper-analysis (RDFT kernels), two
    3-layer hyper-synthesis stacks and 3x num_slices SliceTransforms
    (all with plain-variable kernels), DeepFactorized hyperprior.
    """
    params = {}
    for side, gdn_name in (("analysis", "gdn"), ("synthesis", "igdn")):
        sub = {}
        for i in range(4):
            sub[f"layer_{i}"] = _port_conv_entry(tf_vars, f"{side}/layer_{i}")
        for i in range(3):
            key = f"{side}/{gdn_name}_{i}"
            sub[f"{gdn_name}_{i}"] = port_gdn(
                tf_vars[f"{key}/beta"], tf_vars[f"{key}/gamma"])
        params[side] = sub
    for side in ("hyper_analysis", "hyper_synthesis_mean",
                 "hyper_synthesis_scale"):
        params[side] = {
            f"layer_{i}": _port_conv_entry(tf_vars, f"{side}/layer_{i}")
            for i in range(3)}
    for grp in ("cc_mean", "cc_scale", "lrp"):
        for s in range(num_slices):
            params[f"{grp}_{s}"] = {
                f"layer_{i}": _port_conv_entry(tf_vars, f"{grp}_{s}/layer_{i}")
                for i in range(3)}
    n_layers = len([k for k in tf_vars if k.startswith("prior/matrix_")])
    params["hyperprior"] = port_deep_factorized(
        [tf_vars[f"prior/matrix_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/bias_{i}"] for i in range(n_layers)],
        [tf_vars[f"prior/factor_{i}"] for i in range(n_layers - 1)])
    return {"params": params}


def extract_ms2020(analysis, synthesis, hyper_analysis,
                   hyper_synthesis_mean, hyper_synthesis_scale,
                   cc_mean, cc_scale, lrp, prior_base):
    """Flattens reference ms2020 layer stacks into the dict
    `port_ms2020` expects.  cc_mean/cc_scale/lrp are lists (one per
    slice) of 3-conv lists."""
    tf_vars = {}
    extract_conv_stack(tf_vars, "analysis", analysis, "gdn")
    extract_conv_stack(tf_vars, "synthesis", synthesis, "igdn")
    extract_conv_stack(tf_vars, "hyper_analysis", hyper_analysis)
    extract_conv_stack(tf_vars, "hyper_synthesis_mean",
                       hyper_synthesis_mean)
    extract_conv_stack(tf_vars, "hyper_synthesis_scale",
                       hyper_synthesis_scale)
    for grp, stacks in (("cc_mean", cc_mean), ("cc_scale", cc_scale),
                        ("lrp", lrp)):
        for s, convs in enumerate(stacks):
            extract_conv_stack(tf_vars, f"{grp}_{s}", convs)
    for k, v in extract_deep_factorized(prior_base).items():
        tf_vars[f"prior/{k}"] = v
    return tf_vars
