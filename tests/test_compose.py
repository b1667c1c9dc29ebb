"""Composition-operator unit tests against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_diffusion_models_tpu import compose


def test_weighted_equal_weights_is_mean(key):
    eps = jax.random.normal(key, (3, 4, 8))
    out = compose.weighted(eps, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(eps.mean(0)),
                               rtol=1e-5)


def test_weighted_normalizes():
    eps = jnp.stack([jnp.ones((2, 3)), jnp.zeros((2, 3))])
    out = compose.weighted(eps, jnp.array([3.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out), 0.75, rtol=1e-6)


def test_kappa_ito_hand_value():
    # s1 = [1, 0], s2 = [0, 0] per example; divs 2 and 1; sigma = 0.5
    s1 = jnp.array([[1.0, 0.0]])
    s2 = jnp.array([[0.0, 0.0]])
    divs = (jnp.array([2.0]), jnp.array([1.0]))
    # kappa = (0.5*(2-1) + <s1, s1-s2>) / ||s1-s2||^2 = (0.5 + 1) / 1 = 1.5
    k = compose.kappa_ito(0.5, divs, (s1, s2))
    assert abs(float(k[0]) - 1.5) < 1e-6
    k_clipped = compose.kappa_ito(0.5, divs, (s1, s2), clip=(-1.0, 1.0))
    assert abs(float(k_clipped[0]) - 1.0) < 1e-6
    combined = compose.combine_kappa(k, s1, s2)
    np.testing.assert_allclose(np.asarray(combined), [[1.5, 0.0]], rtol=1e-6)


def test_kappa_ito_identical_scores_degenerates_to_zero():
    s = jnp.ones((2, 4))
    k = compose.kappa_ito(0.3, (jnp.zeros(2), jnp.zeros(2)), (s, s))
    assert bool(jnp.all(jnp.isfinite(k)))
    np.testing.assert_allclose(np.asarray(compose.combine_kappa(k, s, s)),
                               np.asarray(s), rtol=1e-5)


def test_or_softmax_properties():
    log_q = jnp.array([[0.0, 10.0], [0.0, 0.0]])  # (K=2, B=2)
    k = compose.or_softmax(log_q)
    np.testing.assert_allclose(np.asarray(k.sum(0)), 1.0, rtol=1e-6)
    assert float(k[0, 1]) > 0.99           # higher log-density wins
    assert abs(float(k[0, 0]) - 0.5) < 1e-6


def test_or_softmax_scalar_bias_rejected():
    # softmax is shift-invariant: a scalar bias sweeps nothing, so a concrete
    # non-zero scalar must raise instead of silently no-oping (VERDICT r2)
    log_q = jnp.zeros((2, 3))
    with pytest.raises(ValueError, match="inert"):
        compose.or_softmax(log_q, bias=0.7)
    # zero scalar (the default) stays fine
    k = compose.or_softmax(log_q, bias=0.0)
    np.testing.assert_allclose(np.asarray(k), 0.5, rtol=1e-6)


def test_or_softmax_per_expert_bias_tilts():
    log_q = jnp.zeros((2, 3))
    k = compose.or_softmax(log_q, bias=jnp.array([2.0, 0.0]))
    assert bool(jnp.all(k[0] > 0.85))      # biased expert wins everywhere
    np.testing.assert_allclose(np.asarray(k.sum(0)), 1.0, rtol=1e-6)
    # (K, 1) column form is equivalent
    k2 = compose.or_softmax(log_q, bias=jnp.array([[2.0], [0.0]]))
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k), rtol=1e-6)


def test_and_solve_per_expert_bias_tilts():
    # identical experts -> singular rows; give the system full rank first
    a = jnp.zeros((1, 2, 2)).at[:, 0, 0].set(1.0)   # p=1, q=0
    b = jnp.zeros((1, 2))
    base = compose.and_solve(a, b)                   # r=0 -> k=(0, 1)
    np.testing.assert_allclose(np.asarray(base), [[0.0, 1.0]], atol=1e-6)
    tilted = compose.and_solve(a, b, bias=jnp.array([0.0, 0.5]))
    # per-expert bias enters as bias[1]-bias[0]=0.5 -> k0 = 0.5
    np.testing.assert_allclose(np.asarray(tilted), [[0.5, 0.5]], atol=1e-6)
    # bad shape rejected
    with pytest.raises(ValueError, match="bias"):
        compose.and_solve(a, b, bias=jnp.array([1.0, 2.0, 3.0]))


def test_and_heuristic_inverts_preference():
    log_q = jnp.array([[10.0], [0.0]])
    k = compose.and_heuristic(log_q)
    assert float(k[0, 0]) < 0.01  # denser expert is DOWN-weighted


def test_and_solve_exact_system():
    # Build a system whose unconstrained solution is kappa = (0.25, 0.75):
    # [[p, q], [1, 1]] k = [r, 1] with p=2, q=-2 -> r = 2*0.25 - 2*0.75 = -1
    a = jnp.zeros((1, 2, 2)).at[:, 0, 0].set(2.0)  # a00-a10 = 2
    a = a.at[:, 0, 1].set(-2.0)                    # a01-a11 = -2
    b = jnp.array([[1.0, 0.0]])                    # r = b1 - b0 = -1
    k = compose.and_solve(a, b)
    np.testing.assert_allclose(np.asarray(k), [[0.25, 0.75]], atol=1e-6)


def test_and_solve_singular_falls_back_to_half():
    a = jnp.zeros((1, 2, 2))
    b = jnp.zeros((1, 2))
    k = compose.and_solve(a, b)
    np.testing.assert_allclose(np.asarray(k), [[0.5, 0.5]], atol=1e-6)


def test_and_solve_clamps_and_renormalizes():
    # unconstrained solution far outside [0, 1]
    a = jnp.zeros((1, 2, 2)).at[:, 0, 0].set(1.0)
    b = jnp.array([[0.0, 5.0]])  # r = 5 -> k0 = 5, clamp to 1; k1 = -4 -> 0
    k = compose.and_solve(a, b)
    np.testing.assert_allclose(np.asarray(k), [[1.0, 0.0]], atol=1e-6)


def test_cfg_formula():
    eu = jnp.zeros((2, 3))
    ec = jnp.stack([jnp.ones((2, 3)), 2.0 * jnp.ones((2, 3))])
    out = compose.cfg(eu, ec, jnp.array([0.5, 0.25]))
    # 0 + 0.5*(1-0) + 0.25*(2-0) = 1.0
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_resolve_occlusion_disjoint_last_on_top():
    m0 = jnp.ones((4, 4))
    m1 = jnp.zeros((4, 4)).at[:2].set(1.0)
    out = compose.resolve_occlusion(jnp.stack([m0, m1]))
    # last mask (m1) keeps its full region; m0 keeps the rest
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(m1))
    np.testing.assert_allclose(np.asarray(out[0] + out[1]), 1.0)
    assert float(jnp.max(out[0] * out[1])) == 0.0


def test_resolve_occlusion_golden_vs_reference_loop():
    """Golden parity: compose.resolve_occlusion == the reference's own
    top-down claim loop (composing_colored_digit_to_simulate_overlaying.py:
    69-80, re-implemented verbatim in numpy) on random overlapping masks,
    both binary (circular, the reference's create_circular_mask shape) and
    soft-valued, K = 2..4."""
    rng = np.random.default_rng(0)
    for k in (2, 3, 4):
        for soft in (False, True):
            if soft:
                masks_np = rng.uniform(0, 1, (k, 9, 9)).astype(np.float32)
            else:
                yy, xx = np.mgrid[:9, :9]
                masks_np = np.stack([
                    ((yy - rng.integers(2, 7)) ** 2
                     + (xx - rng.integers(2, 7)) ** 2 <= 9).astype(np.float32)
                    for _ in range(k)])
            # the reference loop, verbatim semantics
            final = [np.zeros_like(m) for m in masks_np]
            occ = np.zeros_like(masks_np[0])
            for i in range(k - 1, -1, -1):
                unique = np.clip(masks_np[i] - occ, 0, 1)
                final[i] = unique
                occ += unique
            ours = compose.resolve_occlusion(jnp.asarray(masks_np))
            np.testing.assert_allclose(np.asarray(ours), np.stack(final),
                                       atol=1e-6, err_msg=f"k={k} soft={soft}")


def test_masked_sum():
    eps = jnp.stack([jnp.ones((1, 4, 4, 3)), -jnp.ones((1, 4, 4, 3))])
    masks = jnp.stack([jnp.ones((4, 4)).at[:, :2].set(0.0),
                       jnp.zeros((4, 4)).at[:, :2].set(1.0)])
    out = compose.masked(eps, masks)
    np.testing.assert_allclose(np.asarray(out[0, :, :2, 0]), -1.0)
    np.testing.assert_allclose(np.asarray(out[0, :, 2:, 0]), 1.0)


def test_fixed_kappa():
    eps = jnp.stack([jnp.ones((2, 2)), 3.0 * jnp.ones((2, 2))])
    out = compose.fixed(eps, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


class TestAndSolveK:
    def test_k2_matches_and_solve(self, key):
        a = jax.random.normal(key, (16, 2, 2))
        b = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
        np.testing.assert_allclose(
            np.asarray(compose.and_solve_k(a, b, bias=0.3)),
            np.asarray(compose.and_solve(a, b, bias=0.3)),
            rtol=1e-5, atol=1e-6)

    def test_k3_solves_constructed_system(self, key):
        # build a system whose exact solution lies strictly inside the
        # simplex, so clamp/renorm are no-ops and solve must recover it
        kappa_true = jnp.array([[0.5, 0.3, 0.2]])
        a = jax.random.normal(key, (1, 3, 3))
        rows = a[:, :-1, :] - a[:, 1:, :]
        rhs_rows = jnp.einsum("brc,bc->br", rows, kappa_true)
        b0 = jnp.zeros((1,))
        # b[r+1] - b[r] = rhs_rows[r]  ->  cumulative sums
        b = jnp.concatenate([b0[:, None],
                             b0[:, None] + jnp.cumsum(rhs_rows, axis=1)],
                            axis=1)
        kappa = compose.and_solve_k(a, b)
        np.testing.assert_allclose(np.asarray(kappa), np.asarray(kappa_true),
                                   rtol=1e-4, atol=1e-5)

    def test_singular_falls_back_uniform(self):
        a = jnp.zeros((4, 3, 3))  # rows identical -> singular top block
        b = jnp.zeros((4, 3))
        kappa = compose.and_solve_k(a, b)
        np.testing.assert_allclose(np.asarray(kappa), 1.0 / 3, atol=1e-6)

    def test_simplex_constraints(self, key):
        a = jax.random.normal(key, (32, 4, 4))
        b = jax.random.normal(jax.random.fold_in(key, 2), (32, 4))
        kappa = compose.and_solve_k(a, b)
        assert bool(jnp.all(kappa >= 0)) and bool(jnp.all(kappa <= 1))
        np.testing.assert_allclose(np.asarray(kappa.sum(axis=1)), 1.0,
                                   atol=1e-5)


class TestProjected:
    """compose.projected — orthogonal substitution along the luma row."""

    def test_weight1_replaces_luma_exactly(self, key):
        e_full = jax.random.normal(key, (2, 8, 8, 3))
        e_sub = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
        out = compose.projected(e_full, e_sub, 1.0)
        w = jnp.asarray(compose.LUMA_W)
        w = w / jnp.sqrt(jnp.sum(w * w))
        # P out == eps_sub (the subspace expert owns the luma component)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out * w, axis=-1, keepdims=True)),
            np.asarray(e_sub), atol=1e-5)
        # (I - P^T P) out == (I - P^T P) e_full (chrominance untouched)
        def chroma(x):
            p = jnp.sum(x * w, axis=-1, keepdims=True)
            return x - p * w
        np.testing.assert_allclose(np.asarray(chroma(out)),
                                   np.asarray(chroma(e_full)), atol=1e-5)

    def test_weight0_is_identity(self, key):
        e_full = jax.random.normal(key, (2, 4, 4, 3))
        e_sub = jnp.zeros((2, 4, 4, 1))
        np.testing.assert_allclose(
            np.asarray(compose.projected(e_full, e_sub, 0.0)),
            np.asarray(e_full), atol=1e-7)

    def test_consistent_estimate_norm(self, key):
        # substituting one orthogonal component keeps a unit-noise estimate
        # a unit-noise estimate: E||out||^2 == E||eps||^2 for exact inputs
        eps = jax.random.normal(key, (4, 8, 8, 3))
        w = jnp.asarray(compose.LUMA_W)
        w = w / jnp.sqrt(jnp.sum(w * w))
        p_eps = jnp.sum(eps * w, axis=-1, keepdims=True)
        out = compose.projected(eps, p_eps, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(eps),
                                   atol=1e-5)
