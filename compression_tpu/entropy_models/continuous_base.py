"""Base class for continuous entropy models.

JAX counterpart of the reference's continuous_base.py: pre-computes integer
probability tables from a prior distribution so the range coder behaves
identically across platforms.

Key invariant carried over from the reference (continuous_base.py:176-184):
CDF tables are built ONCE and serialized/shared — never re-derived on the
decoder side — because float nondeterminism between sender and receiver
would cause catastrophic range-decode divergence.  Table construction
samples the prior's PMF with JAX and quantizes rows to integer CDFs on the
host (the reference pins this to CPU as well, continuous_base.py:281-294).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import jax_coder
from compression_tpu.codec import tables
from compression_tpu.distributions import helpers
from compression_tpu.distributions import uniform_noise

__all__ = ["ContinuousEntropyModelBase"]


class ContinuousEntropyModelBase:
    """Shared machinery: table build, log-prob evaluation, serialization."""

    def __init__(self,
                 coding_rank=None,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 bottleneck_dtype=None,
                 laplace_tail_mass=0.0):
        self._prior = None
        self._coding_rank = int(coding_rank)
        self._compression = bool(compression)
        self._stateless = bool(stateless)
        self._expected_grads = bool(expected_grads)
        self._tail_mass = float(tail_mass)
        self._bottleneck_dtype = bottleneck_dtype or jnp.float32
        self._laplace_tail_mass = laplace_tail_mass
        self._cdf = None
        self._cdf_offset = None
        self._device_table = None

        if self.coding_rank < 0:
            raise ValueError("`coding_rank` must be at least 0.")
        if not 0 < self.tail_mass < 1:
            raise ValueError("`tail_mass` must be between 0 and 1.")

    def _check_compression(self):
        if not self.compression:
            raise RuntimeError(
                "For range coding, the entropy model must be instantiated "
                "with `compression=True`.")

    @property
    def prior(self):
        if self._prior is None:
            raise RuntimeError(
                "This entropy model doesn't hold a reference to its prior "
                "distribution.")
        return self._prior

    @property
    def cdf(self):
        """Ragged CDF table (reference wire format), as a numpy int32 array."""
        self._check_compression()
        return self._cdf

    @property
    def cdf_offset(self):
        self._check_compression()
        return self._cdf_offset

    @property
    def bottleneck_dtype(self):
        return self._bottleneck_dtype

    @property
    def expected_grads(self):
        return self._expected_grads

    @property
    def laplace_tail_mass(self):
        return self._laplace_tail_mass

    @property
    def coding_rank(self):
        return self._coding_rank

    @property
    def compression(self):
        return self._compression

    @property
    def stateless(self):
        return self._stateless

    @property
    def tail_mass(self):
        return self._tail_mass

    @property
    def range_coder_precision(self):
        """Precision used by the range coder (= -cdf[0])."""
        return -int(self.cdf[0])

    @property
    def device_table(self):
        """Dense device-side CDF table for the TPU kernels."""
        self._check_compression()
        if self._device_table is None:
            # The table is built from concrete numpy and cached on self;
            # ensure_compile_time_eval keeps the arrays concrete even when
            # the first access happens inside a jit trace (otherwise
            # tracers would leak into the cache).
            with jax.ensure_compile_time_eval():
                self._device_table = jax_coder.DeviceCdfTable(
                    tables.parse_ragged_cdf(self._cdf))
        return self._device_table

    def _init_compression(self, cdf, cdf_offset, cdf_shapes):
        """Stores the range coding tables (or placeholders from shapes)."""
        if not (cdf is None) == (cdf_offset is None) == (cdf_shapes is not None):
            raise ValueError(
                "Either both `cdf` and `cdf_offset`, or `cdf_shapes` must be "
                "provided.")
        if cdf_shapes is not None:
            if self.stateless:
                raise ValueError(
                    "With `stateless=True`, can't provide `cdf_shapes`.")
            cdf_shapes = tuple(map(int, cdf_shapes))
            if len(cdf_shapes) != 2:
                raise ValueError("`cdf_shapes` must have two elements.")
            cdf = np.zeros(cdf_shapes[:1], np.int32)
            cdf_offset = np.zeros(cdf_shapes[1:], np.int32)
        self._cdf = np.asarray(cdf, np.int32)
        self._cdf_offset = np.asarray(cdf_offset, np.int32)
        self._device_table = None

    def _build_tables(self, prior, precision, offset=None):
        """Computes ragged CDF table + offsets from the prior.

        Mirrors reference continuous_base.py:217-296: tails -> integer
        supports -> PMF sampling on a [max_length, batch] grid -> per-row
        overflow mass -> greedy integer CDF quantization -> ragged concat
        with a leading ``-precision`` marker per row (negative = overflow
        coding enabled).
        """
        precision = int(precision)
        if offset is None:
            offset = jnp.zeros((), self.bottleneck_dtype)
        offset = jnp.asarray(offset, self.bottleneck_dtype)

        lower = helpers.lower_tail(prior, self.tail_mass)
        upper = helpers.upper_tail(prior, self.tail_mass)
        minima = jnp.floor(lower - offset).astype(jnp.int32)
        maxima = jnp.ceil(upper - offset).astype(jnp.int32)

        pmf_start = minima.astype(self.bottleneck_dtype) + offset
        pmf_length = maxima - minima + 1

        max_length = int(jnp.max(pmf_length))
        if max_length > 2048:
            import warnings
            warnings.warn(
                f"Very wide PMF with {max_length} elements may lead to out "
                "of memory issues. Consider priors with smaller variance, "
                "or increasing `tail_mass`.")
        samples = jnp.arange(max_length, dtype=self.bottleneck_dtype)
        samples = samples.reshape(
            (-1,) + (1,) * int(np.ndim(pmf_length)))
        samples = samples + pmf_start
        pmf = prior.prob(samples)
        pmf_shape = pmf.shape[1:]
        num_pmfs = int(np.prod(pmf_shape)) if pmf_shape else 1

        pmf = np.asarray(pmf.reshape(max_length, num_pmfs).T, np.float64)
        pmf_length = np.broadcast_to(
            np.asarray(pmf_length), pmf_shape).reshape(num_pmfs)
        cdf_offset = np.broadcast_to(
            np.asarray(minima), pmf_shape).reshape(num_pmfs)

        # Host-side greedy quantization per row (CPU-pinned in the
        # reference too); rows concatenated in the ragged wire format.
        parts = []
        for i in range(num_pmfs):
            p = pmf[i, : pmf_length[i]].astype(np.float32)
            ovf = max(1.0 - p.sum(), 0.0)
            p = np.concatenate([p, [np.float32(ovf)]])
            c = tables.pmf_to_quantized_cdf(p, precision)
            parts.append(np.asarray([-precision], np.int32))
            parts.append(c)
        cdf = np.concatenate(parts) if parts else np.zeros(0, np.int32)
        return cdf, cdf_offset.astype(np.int32)

    def _log_prob(self, prior, bottleneck_perturbed):
        """prior.log_prob with optional NoisyLaplace mixture stabilizer."""
        ltm = self.laplace_tail_mass
        is_traced = isinstance(ltm, jax.Array)
        if not is_traced and not ltm:
            return prior.log_prob(bottleneck_perturbed)

        laplace_prior = uniform_noise.NoisyLaplace(
            loc=jnp.zeros((), self.bottleneck_dtype),
            scale=jnp.ones((), self.bottleneck_dtype))
        probs = prior.prob(bottleneck_perturbed)
        probs = ((1 - ltm) * probs
                 + ltm * laplace_prior.prob(bottleneck_perturbed))
        probs_too_small = probs < 1e-10
        probs_bounded = jnp.maximum(probs, 1e-10)
        mixture = jnp.where(
            probs_too_small,
            jnp.log(jnp.maximum(ltm, 1e-30))
            + laplace_prior.log_prob(bottleneck_perturbed),
            jnp.log(probs_bounded))
        if is_traced:
            return jnp.where(
                ltm > 0, mixture, prior.log_prob(bottleneck_perturbed))
        return mixture

    def get_config(self):
        if self.stateless or not self.compression:
            raise RuntimeError(
                "Serializing entropy models with `compression=False` or "
                "`stateless=True` is not supported.")
        return dict(
            coding_rank=self.coding_rank,
            compression=True,
            stateless=False,
            expected_grads=self.expected_grads,
            tail_mass=self.tail_mass,
            cdf_shapes=(int(self.cdf.shape[0]),
                        int(self.cdf_offset.shape[0])),
            laplace_tail_mass=float(self.laplace_tail_mass),
        )

    def get_weights(self):
        return [np.asarray(self.cdf), np.asarray(self.cdf_offset)]

    def set_weights(self, weights):
        if len(weights) != 2:
            raise ValueError("Expected [cdf, cdf_offset].")
        self._cdf = np.asarray(weights[0], np.int32)
        self._cdf_offset = np.asarray(weights[1], np.int32)
        self._device_table = None
