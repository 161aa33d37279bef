"""Probe: does a bf16-activations train step beat the f32 one on the chip?

Measurement-only — builds a mixed-precision twin of the bls2017 train
step (conv/GDN params + activations in bf16, entropy model + loss in
f32, f32 master params) and times both with the repo k-loop method
(tools/train_bench.py:_time_train_k).

Measured 2026-08-22 (one v5e chip, shared session): f32 3.39 ms,
bf16 2.99 ms — 1.13x, losses equal to 5 significant digits
(221.507 vs 221.507, bpp 2.6907 both).  Not adopted as the default:
the forward/backward convs already run bf16-multiply/f32-accumulate
on the MXU (JAX default conv precision on TPU — see
docs/ARCHITECTURE.md "Transform MFU"), so mixed precision only trims
f32 activation HBM traffic and VPU elementwise work, and 13% on a
path that already records ~700x vs the reference stack does not
justify forking the train step across four families.  Kept as the
recipe if a future deployment wants it.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp
import optax

from compression_tpu.models.bls2017 import BLS2017Model, make_train_step
from compression_tpu.entropy_models.continuous_batched import (
    ContinuousBatchedEntropyModel)
from tools.train_bench import _time_train_k

PATCH, BATCH = 256, 8

model = BLS2017Model()
key = jax.random.PRNGKey(0)
key, ik, tk = jax.random.split(key, 3)
params = jax.jit(model.init, static_argnames=("training",))(
    ik, jnp.zeros((1, PATCH, PATCH, 3)), training=False)
opt = optax.adam(1e-4)
opt_state = opt.init(params)
rng = np.random.RandomState(0)
batch_d = jax.device_put(
    rng.uniform(0, 255, (BATCH, PATCH, PATCH, 3)).astype(np.float32))

# ---- f32 baseline (existing step) ----
f32_step = make_train_step(model, opt)
med, lo, hi, cs = _time_train_k(f32_step, params, opt_state, batch_d, tk)
print(f"f32:  {med*1e3:.2f} ms  [{lo*1e3:.2f}, {hi*1e3:.2f}]  compile {cs:.1f}s")

# ---- bf16 twin ----
def cast_mixed(p):
    def f(path, leaf):
        if any(getattr(k, "key", None) == "prior" for k in path):
            return leaf
        return leaf.astype(jnp.bfloat16)
    return jax.tree_util.tree_map_with_path(f, p)

def fwd(m, x, key):
    xb = x.astype(jnp.bfloat16)
    y = m.analysis(xb)
    em = ContinuousBatchedEntropyModel(
        prior=m.prior(), coding_rank=3, compression=False,
        offset_heuristic=False)
    y_hat, bits = em(y.astype(jnp.float32), training=True, key=key)
    x_hat = m.synthesis(y_hat.astype(jnp.bfloat16))
    x_hat = x_hat[:, : x.shape[1], : x.shape[2], :].astype(jnp.float32)
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = jnp.sum(bits) / num_pixels
    mse = jnp.mean(jnp.square(x - x_hat))
    return bpp + m.lmbda * mse, (bpp, mse)

@jax.jit
def bf16_step(params, opt_state, batch, key):
    def loss_fn(p):
        loss, (bpp, mse) = model.apply(cast_mixed(p), batch, key,
                                       method=fwd)
        return loss, (bpp, mse)
    (loss, (bpp, mse)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, "bpp": bpp, "mse": mse}

# sanity: losses close
_, _, m32 = jax.jit(f32_step)(params, opt_state, batch_d, tk)
_, _, m16 = bf16_step(params, opt_state, batch_d, tk)
print("loss f32/bf16:", float(m32["loss"]), float(m16["loss"]),
      " bpp:", float(m32["bpp"]), float(m16["bpp"]),
      " mse:", float(m32["mse"]), float(m16["mse"]))

med2, lo2, hi2, cs2 = _time_train_k(bf16_step, params, opt_state,
                                    batch_d, tk)
print(f"bf16: {med2*1e3:.2f} ms  [{lo2*1e3:.2f}, {hi2*1e3:.2f}]  "
      f"compile {cs2:.1f}s   speedup {med/med2:.2f}x")
