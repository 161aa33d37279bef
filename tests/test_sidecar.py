"""Sidecar escape mode: escapes coded out of band (TPU-native container).

The stream carries only the escape marker symbol; (position, value) pairs
travel as side arrays.  Reconstruction must be exact, including values far
outside the table range, and compressed size must track the in-stream
format minus the gamma bits.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu import distributions as d
from compression_tpu.codec import jax_coder, tables
from compression_tpu.entropy_models.continuous_batched import (
    ContinuousBatchedEntropyModel,
)
from compression_tpu.entropy_models.continuous_indexed import (
    LocationScaleIndexedEntropyModel,
)


def _mixed_table(rng, num_rows=5, precision=12):
    rows = []
    for _ in range(num_rows):
        alphabet = rng.randint(3, 30)
        pmf = rng.dirichlet(np.ones(alphabet))
        rows.append(tables.pmf_to_quantized_cdf(pmf, precision))
    return tables.parse_ragged_cdf(tables.build_ragged_cdf(
        rows, [precision] * num_rows, [True] * num_rows))


class TestCodecSidecar:
    def test_round_trip_with_escapes(self):
        rng = np.random.RandomState(3)
        t = _mixed_table(rng)
        lens = np.asarray(t.length)
        S, N = 8, 64
        idx = rng.randint(0, t.num_rows, (S, N)).astype(np.int32)
        mv = lens[idx] - 2
        sym = np.round(rng.laplace(0, 20, (S, N))).astype(np.int32)
        # Mix of in-range, large positive and negative values.
        keep = rng.rand(S, N) < 0.7
        sym = np.where(keep, np.clip(np.abs(sym), 0, mv - 1), sym)
        assert ((sym < 0) | (sym >= mv)).any()

        buf, lengths, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            sym, t, idx)
        got, sane = jax_coder.decode_streams_sidecar(
            buf, lengths, N, t, esc_pos, esc_val, idx)
        np.testing.assert_array_equal(got, sym)
        assert sane.all()

    def test_no_escapes_matches_plain_encode(self):
        """Without escapes, sidecar bytes == the in-stream format bytes."""
        rng = np.random.RandomState(4)
        t = _mixed_table(rng)
        lens = np.asarray(t.length)
        S, N = 4, 48
        idx = rng.randint(0, t.num_rows, (S, N)).astype(np.int32)
        mv = lens[idx] - 2
        sym = (rng.randint(0, 1 << 16, (S, N)) % np.maximum(mv, 1)).astype(
            np.int32)
        buf_s, len_s, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            sym, t, idx)
        assert esc_pos.size == 0 and esc_val.size == 0
        buf_p, len_p = jax_coder.encode_streams(sym, t, idx)
        np.testing.assert_array_equal(len_s, len_p)
        for s in range(S):
            assert bytes(buf_s[s, : len_s[s]]) == bytes(
                buf_p[s, : len_p[s]])

    def test_sidecar_smaller_than_instream_on_escapes(self):
        """Escape-heavy data: sidecar streams shed the gamma bits."""
        rng = np.random.RandomState(5)
        t = _mixed_table(rng)
        lens = np.asarray(t.length)
        S, N = 4, 128
        idx = rng.randint(0, t.num_rows, (S, N)).astype(np.int32)
        mv = lens[idx] - 2
        sym = np.where(rng.rand(S, N) < 0.25,
                       mv + rng.randint(100, 5000, (S, N)),
                       np.clip(rng.randint(0, 30, (S, N)), 0, mv - 1)
                       ).astype(np.int32)
        _, len_s, _, _ = jax_coder.encode_streams_sidecar(sym, t, idx)
        _, len_p = jax_coder.encode_streams(sym, t, idx)
        assert len_s.sum() < len_p.sum()


class TestEntropyModelSidecar:
    def test_batched_em_round_trip(self):
        em = ContinuousBatchedEntropyModel(
            prior=d.NoisyNormal(loc=jnp.zeros((4,)), scale=0.7),
            coding_rank=2, compression=True)
        x = 8.0 * jax.random.normal(jax.random.PRNGKey(0), (3, 10, 4))
        buf, lengths, esc_pos, esc_val = em.compress_sidecar(x)
        got = em.decompress_sidecar(buf, lengths, (10,), esc_pos, esc_val)
        want = em.quantize(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_indexed_em_round_trip(self):
        num_scales = 8
        scale_fn = lambda i: jnp.exp(
            jnp.log(0.2) + i / (num_scales - 1)
            * (jnp.log(8.0) - jnp.log(0.2)))
        em = LocationScaleIndexedEntropyModel(
            prior_fn=d.NoisyNormal, num_scales=num_scales,
            scale_fn=scale_fn, coding_rank=2, compression=True)
        key = jax.random.PRNGKey(1)
        idx = jax.random.randint(key, (3, 20), 0, num_scales)
        scales = scale_fn(idx.astype(jnp.float32))
        x = 30.0 * scales * jax.random.normal(jax.random.PRNGKey(2),
                                              (3, 20))
        buf, lengths, esc_pos, esc_val = em.compress_sidecar(x, idx)
        got = em.decompress_sidecar(buf, lengths, idx, esc_pos, esc_val)
        want = em.quantize(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        assert esc_pos.size > 0  # 30-sigma data must escape somewhere
