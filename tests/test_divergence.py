"""Divergence estimator tests: Hutchinson vs exact Jacobian trace."""

import jax
import jax.numpy as jnp
import numpy as np

from composable_diffusion_models_tpu.ops.divergence import exact_div, value_and_div


def linear_fn(A):
    return lambda x: x @ A.T


def test_exact_div_is_trace(key):
    A = jax.random.normal(key, (5, 5))
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 5))
    val, div = exact_div(linear_fn(A), x)
    np.testing.assert_allclose(np.asarray(div), float(jnp.trace(A)),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(val), np.asarray(x @ A.T), rtol=1e-5)


def test_rademacher_unbiased_for_linear(key):
    # For linear maps, a Rademacher estimate <v, Av> = sum_i A_ii v_i^2 +
    # off-diag terms; with v_i^2 = 1 the diagonal is EXACT per probe, so the
    # mean over probes converges fast.
    A = jax.random.normal(key, (6, 6))
    x = jnp.zeros((2, 6))
    _, div = value_and_div(linear_fn(A), x, jax.random.fold_in(key, 2),
                           probe="rademacher", n_probes=128)
    np.testing.assert_allclose(np.asarray(div), float(jnp.trace(A)), atol=0.5)


def test_gaussian_estimator_converges(key):
    A = jax.random.normal(key, (4, 4))
    x = jnp.zeros((2, 4))
    _, div = value_and_div(linear_fn(A), x, jax.random.fold_in(key, 3),
                           probe="gaussian", n_probes=1024)
    np.testing.assert_allclose(np.asarray(div), float(jnp.trace(A)), atol=0.5)


def test_nonlinear_matches_exact(key):
    def fn(x):
        return jnp.tanh(x) * x

    x = jax.random.normal(key, (3, 4))
    _, exact = exact_div(fn, x)
    _, est = value_and_div(fn, x, jax.random.fold_in(key, 4),
                           probe="rademacher", n_probes=256)
    np.testing.assert_allclose(np.asarray(est), np.asarray(exact), atol=0.3)


def test_value_matches_fn(key):
    def fn(x):
        return jnp.sin(x)

    x = jax.random.normal(key, (2, 3))
    val, _ = value_and_div(fn, x, key)
    np.testing.assert_allclose(np.asarray(val), np.asarray(jnp.sin(x)),
                               rtol=1e-5)
