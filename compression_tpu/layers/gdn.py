"""Generalized divisive normalization (GDN) layer.

JAX/flax counterpart of the reference's python/layers/gdn.py (Ballé et al.,
"Density modeling of images using a generalized normalization
transformation"):

    y[i] = x[i] / (beta[i] + sum_j gamma[j, i] * |x[j]|^alpha)^epsilon

with the inverse (IGDN) replacing the division by a multiplication.  The
channel mixing is an einsum over the channel axis, which XLA lowers to a
1x1-conv matmul on the MXU.  Channels-last layout only (TPU-native).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from compression_tpu.layers import parameters

__all__ = ["GDN"]


class GDN(nn.Module):
    """GDN or IGDN activation.

    Attributes:
      inverse: False -> GDN (divide), True -> IGDN (multiply).
      rectify: apply relu to the inputs first.
      alpha: fixed exponent on inputs (1 and 2 get fast paths). None
        trains alpha via the GDN reparameterization (minimum 1).
      epsilon: fixed exponent on the norm pool (1 and 0.5 get fast paths);
        None trains it (minimum 1e-6).
      beta_minimum / gamma_init: bounds/initialization matching the
        reference defaults (beta init 1, gamma init 0.1 * I).
    """

    inverse: bool = False
    rectify: bool = False
    alpha: Optional[float] = 1.0
    epsilon: Optional[float] = 1.0
    beta_minimum: float = 1e-6
    gamma_init: float = 0.1
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim < 2:
            raise ValueError("Input must have at least rank 2.")
        num_channels = x.shape[-1]

        beta_var = self.param(
            "reparam_beta",
            lambda key: parameters.gdn_param_init(
                jnp.ones((num_channels,), self.param_dtype)))
        beta = parameters.gdn_param_value(beta_var, minimum=self.beta_minimum)

        gamma_var = self.param(
            "reparam_gamma",
            lambda key: parameters.gdn_param_init(
                self.gamma_init * jnp.eye(num_channels, dtype=self.param_dtype)))
        gamma = parameters.gdn_param_value(gamma_var, minimum=0.0)

        if self.alpha is None:
            alpha_var = self.param(
                "reparam_alpha",
                lambda key: parameters.gdn_param_init(
                    jnp.ones((), self.param_dtype)))
            alpha = parameters.gdn_param_value(alpha_var, minimum=1.0)
        else:
            alpha = self.alpha

        if self.epsilon is None:
            epsilon_var = self.param(
                "reparam_epsilon",
                lambda key: parameters.gdn_param_init(
                    jnp.ones((), self.param_dtype)))
            epsilon = parameters.gdn_param_value(epsilon_var, minimum=1e-6)
        else:
            epsilon = self.epsilon

        if self.rectify:
            x = jnp.maximum(x, 0.0)

        if self.alpha == 1.0 and self.rectify:
            norm_pool = x
        elif self.alpha == 1.0:
            norm_pool = jnp.abs(x)
        elif self.alpha == 2.0:
            norm_pool = jnp.square(x)
        else:
            norm_pool = jnp.abs(x) ** alpha

        # Channel mixing: gamma[j, i] pools channel j into output channel i.
        norm_pool = jnp.einsum(
            "...j,ji->...i", norm_pool, gamma,
            preferred_element_type=jnp.float32).astype(x.dtype)
        norm_pool = norm_pool + beta

        if self.epsilon == 1.0:
            pass
        elif self.epsilon == 0.5:
            norm_pool = jnp.sqrt(norm_pool)
        else:
            norm_pool = norm_pool ** epsilon

        return x * norm_pool if self.inverse else x / norm_pool
