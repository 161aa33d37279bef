"""Tests for math/round/padding ops (reference math_ops/round_ops specs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.ops import math_ops, padding_ops, round_ops


class TestBounds:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(math_ops.upper_bound(x, 1.0), [-1, 0.5, 1])
        np.testing.assert_allclose(math_ops.lower_bound(x, 0.0), [0, 0.5, 2])

    @pytest.mark.parametrize("gradient,expected", [
        ("identity", [1.0, 1.0, 1.0]),
        ("disconnected", [1.0, 1.0, 0.0]),
        # With upstream grad +1, descent pushes x down (away from an upper
        # bound), so clipped positions pass through under identity_if_towards.
        ("identity_if_towards", [1.0, 1.0, 1.0]),
    ])
    def test_upper_bound_grads_positive_upstream(self, gradient, expected):
        x = jnp.array([-1.0, 0.5, 2.0])
        g = jax.grad(
            lambda x: jnp.sum(math_ops.upper_bound(x, 1.0, gradient)))(x)
        np.testing.assert_allclose(g, expected)

    @pytest.mark.parametrize("gradient,expected", [
        ("identity", [-1.0, -1.0, -1.0]),
        ("disconnected", [-1.0, -1.0, 0.0]),
        ("identity_if_towards", [-1.0, -1.0, 0.0]),
    ])
    def test_upper_bound_grads_negative_upstream(self, gradient, expected):
        x = jnp.array([-1.0, 0.5, 2.0])
        g = jax.grad(
            lambda x: -jnp.sum(math_ops.upper_bound(x, 1.0, gradient)))(x)
        np.testing.assert_allclose(g, expected)

    def test_lower_bound_identity_if_towards(self):
        x = jnp.array([-2.0, 0.5])
        # Positive upstream grad: descent pushes x down, toward the lower
        # bound for clipped values -> zero gradient there.
        g = jax.grad(lambda x: jnp.sum(math_ops.lower_bound(x, 0.0)))(x)
        np.testing.assert_allclose(g, [0.0, 1.0])
        g = jax.grad(lambda x: -jnp.sum(math_ops.lower_bound(x, 0.0)))(x)
        np.testing.assert_allclose(g, [-1.0, -1.0])


class TestRoundSt:
    def test_forward(self):
        x = jnp.array([-1.4, 0.3, 2.5])
        np.testing.assert_allclose(round_ops.round_st(x), [-1.0, 0.0, 2.0])
        off = jnp.array([0.3, 0.3, 0.3])
        np.testing.assert_allclose(
            round_ops.round_st(x, off), jnp.round(x - off) + off)

    def test_straight_through_gradient(self):
        x = jnp.array([-1.4, 0.3, 2.5])
        g = jax.grad(lambda x: jnp.sum(round_ops.round_st(x) * 2.0))(x)
        np.testing.assert_allclose(g, [2.0, 2.0, 2.0])
        off = jnp.array([0.1, 0.1, 0.1])
        g = jax.grad(lambda x: jnp.sum(round_ops.round_st(x, off) * 3.0))(x)
        np.testing.assert_allclose(g, [3.0, 3.0, 3.0])


class TestSoftRound:
    def test_identity_at_low_alpha(self):
        x = jnp.linspace(-2, 2, 50)
        np.testing.assert_allclose(round_ops.soft_round(x, 1e-13), x)

    def test_large_alpha_approaches_round(self):
        x = jnp.linspace(-2.45, 2.45, 50)
        y = round_ops.soft_round(x, 2000.0)
        np.testing.assert_allclose(y, jnp.round(x), atol=0.02)

    def test_inverse(self):
        x = jnp.linspace(-2.4, 2.4, 49)
        for alpha in [1.0, 5.0, 10.0]:
            y = round_ops.soft_round(x, alpha)
            np.testing.assert_allclose(
                round_ops.soft_round_inverse(y, alpha), x, atol=1e-4)

    def test_conditional_mean_midpoints(self):
        # s^-1(y - .5) + .5 at integers equals the integer itself.
        y = jnp.array([-2.0, 0.0, 3.0])
        cm = round_ops.soft_round_conditional_mean(y, 5.0)
        np.testing.assert_allclose(cm, y, atol=1e-4)


class TestPerturbAndApply:
    def test_forward_value(self):
        f = lambda x: x ** 2
        x = jnp.array([1.0, 2.0])
        u = jnp.array([0.25, -0.25])
        y, xpu = math_ops.perturb_and_apply(f, x, u=u)
        np.testing.assert_allclose(xpu, x + u)
        np.testing.assert_allclose(y, (x + u) ** 2)

    def test_expected_grads(self):
        # E_u[d/dx f(x+u)] = f(x+.5) - f(x-.5); for f=x^2 this is 2x.
        f = lambda x: x ** 2
        x = jnp.array([1.5, -0.7])
        u = jnp.array([0.1, 0.4])
        g = jax.grad(
            lambda x: jnp.sum(math_ops.perturb_and_apply(f, x, u=u)[0]))(x)
        np.testing.assert_allclose(g, 2 * x, atol=1e-6)

    def test_arg_grads_flow(self):
        f = lambda x, a: a * x
        x = jnp.array([1.0])
        a = jnp.array([3.0])
        u = jnp.array([0.2])
        ga = jax.grad(
            lambda a: jnp.sum(math_ops.perturb_and_apply(f, x, a, u=u)[0]))(a)
        np.testing.assert_allclose(ga, x + u)

    def test_key_sampling(self):
        f = lambda x: x
        x = jnp.zeros(1000)
        y, xpu = math_ops.perturb_and_apply(f, x, key=jax.random.PRNGKey(0))
        assert np.all(np.abs(np.asarray(xpu)) <= 0.5)
        assert np.std(np.asarray(xpu)) > 0.2


class TestPadding:
    def test_same_padding_corr(self):
        assert padding_ops.same_padding_for_kernel((5,), True) == [(2, 2)]
        assert padding_ops.same_padding_for_kernel((4,), True) == [(2, 1)]
        assert padding_ops.same_padding_for_kernel((4,), False) == [(1, 2)]
        assert padding_ops.same_padding_for_kernel(
            (5, 3), True) == [(2, 2), (1, 1)]
