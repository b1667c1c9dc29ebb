"""Schedule identity tests (SURVEY.md §4a): every (alpha, sigma, beta, g2)
bundle must be internally consistent, and analytic derivatives must match
autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_diffusion_models_tpu.schedules import DDPMSchedule, VPSchedule

TS = jnp.linspace(1e-3, 1.0, 64)


class TestVPStable:
    sch = VPSchedule(kind="stable")

    def test_variance_preserving(self):
        err = self.sch.alpha(TS) ** 2 + self.sch.sigma(TS) ** 2 - 1.0
        assert float(jnp.max(jnp.abs(err))) < 1e-4

    def test_log_alpha_closed_form(self):
        t = 0.37
        expected = -0.5 * t * 0.1 - 0.25 * t**2 * (20.0 - 0.1)
        assert abs(float(self.sch.log_alpha(t)) - expected) < 1e-6

    def test_dlog_alpha_matches_autodiff(self):
        g = jax.vmap(jax.grad(lambda t: self.sch.log_alpha(t)))(TS)
        assert float(jnp.max(jnp.abs(g - self.sch.dlog_alpha_dt(TS)))) < 1e-5

    def test_beta_definition(self):
        expected = -2.0 * self.sch.dlog_alpha_dt(TS) * self.sch.sigma(TS) ** 2
        assert float(jnp.max(jnp.abs(self.sch.beta(TS) - expected))) < 1e-6

    def test_g2_definition(self):
        expected = -2.0 * self.sch.dlog_alpha_dt(TS)
        assert float(jnp.max(jnp.abs(self.sch.g2(TS) - expected))) < 1e-6

    def test_q_t_moments(self, key):
        x0 = jnp.ones((4096, 2)) * 3.0
        t = jnp.full((4096,), 0.5)
        xt, eps = self.sch.q_t(key, x0, t)
        a, s = float(self.sch.alpha(0.5)), float(self.sch.sigma(0.5))
        assert abs(float(xt.mean()) - 3.0 * a) < 0.05
        assert abs(float(xt.std()) - s) < 0.05
        # reconstruction identity
        assert float(jnp.max(jnp.abs(xt - (a * x0 + s * eps)))) < 1e-5


class TestVPCosine:
    """Improved-DDPM cosine schedule (Nichol & Dhariwal 2021 eq. 17),
    continuous form, phase-clamped at the t=1 endpoint (the paper's
    beta <= 0.999 clip analog) — beyond-reference kind."""

    sch = VPSchedule(kind="cosine")

    def test_variance_preserving(self):
        err = self.sch.alpha(TS) ** 2 + self.sch.sigma(TS) ** 2 - 1.0
        assert float(jnp.max(jnp.abs(err))) < 1e-4

    def test_endpoints(self):
        assert abs(float(self.sch.alpha(0.0)) - 1.0) < 1e-6
        a1 = float(self.sch.alpha(1.0))
        assert 0.0 < a1 < 0.05  # clamped floor, NOT exactly 0

    def test_closed_form(self):
        import math
        s = 0.008
        t = 0.37
        expected = (math.cos(math.pi / 2 * (t + s) / (1 + s))
                    / math.cos(math.pi / 2 * s / (1 + s)))
        assert abs(float(self.sch.alpha(t)) - expected) < 1e-6

    def test_dlog_alpha_matches_autodiff(self):
        ts = TS[:-2]  # off the clamp kink
        g = jax.vmap(jax.grad(lambda t: self.sch.log_alpha(t)))(ts)
        assert float(jnp.max(jnp.abs(g - self.sch.dlog_alpha_dt(ts)))) < 1e-4

    def test_g2_and_beta_vp_identities(self):
        expected_g2 = -2.0 * self.sch.dlog_alpha_dt(TS)
        assert float(jnp.max(jnp.abs(self.sch.g2(TS) - expected_g2))) < 1e-5
        expected_b = expected_g2 * self.sch.sigma(TS) ** 2
        assert float(jnp.max(jnp.abs(self.sch.beta(TS) - expected_b))) < 1e-5

    def test_ddim_preserves_standard_normal(self, key):
        from composable_diffusion_models_tpu import samplers
        eps_fn = lambda x, t: self.sch.sigma(t) * x
        x_init = jax.random.normal(key, (512, 2))
        out = samplers.ddim(eps_fn, self.sch, x_init, 100, clip=None)
        assert abs(float(out.std()) - 1.0) < 0.1
        assert abs(float(out.mean())) < 0.1


class TestKarrasSpacing:
    """Karras (EDM eq. 5) timestep spacing via the closed-form t_of_sigma
    inversion — beyond-reference few-step-quality lever."""

    @pytest.mark.parametrize("kind", ["stable", "jax_faithful", "cosine"])
    def test_t_of_sigma_inverts_sigma(self, kind):
        sch = VPSchedule(kind=kind)
        ts = jnp.linspace(1e-3, 0.98, 32)
        sig = sch.sigma(ts)
        back = sch.t_of_sigma(sig)
        assert float(jnp.max(jnp.abs(back - ts))) < 2e-3, kind

    def test_karras_grid_monotone_and_endpoints(self):
        sch = VPSchedule(kind="stable")
        g = sch.ddim_grid(50, spacing="karras")
        assert g.shape == (51,)
        assert float(jnp.max(jnp.diff(g))) < 0.0  # strictly decreasing t
        assert abs(float(g[0]) - 1.0) < 1e-3
        assert float(g[-1]) < 5e-3
        # linear spacing unchanged (reference parity grid)
        lin = sch.ddim_grid(50)
        assert float(jnp.max(jnp.abs(lin - jnp.linspace(1.0, 1e-3, 51)))) == 0

    def test_ddim_karras_preserves_standard_normal(self, key):
        # NOTE: Karras spacing concentrates steps at LOW sigma, so at a
        # fixed step budget the high-noise region is integrated coarsely —
        # the 1st-order DDIM discretization error there shrinks the output
        # std below 1 until the grid is fine enough (~0.84 at 30 steps on
        # this analytic closure; converges with steps). The spacing's win is
        # on real data, where low-sigma detail dominates sample quality.
        from composable_diffusion_models_tpu import samplers
        sch = VPSchedule(kind="stable")
        eps_fn = lambda x, t: sch.sigma(t) * x
        x_init = jax.random.normal(key, (512, 2))
        out = samplers.ddim(eps_fn, sch, x_init, 400, clip=None,
                            spacing="karras")
        assert abs(float(out.std()) - 1.0) < 0.1

    def test_unknown_spacing_rejected(self):
        with pytest.raises(ValueError, match="spacing"):
            VPSchedule().ddim_grid(10, spacing="edm")


class TestVPJaxFaithful:
    sch = VPSchedule(kind="jax_faithful")

    def test_sigma_is_t(self):
        # exp(log(t + 1e-9)) round-trips within fp32 ulp noise
        assert float(jnp.max(jnp.abs(self.sch.sigma(TS) - TS))) < 5e-5

    def test_beta_notebook_form(self):
        t = TS
        expected = 1.0 + 0.5 * t * 0.1 + 0.5 * t**2 * (20.0 - 0.1)
        assert float(jnp.max(jnp.abs(self.sch.beta(t) - expected))) < 1e-4

    def test_g2_consistent_with_sigma(self):
        # variance ODE: g2 = d(sigma^2)/dt - 2 dlog_alpha sigma^2, sigma' = 1
        s = self.sch.sigma(TS)
        expected = 2 * s - 2 * s**2 * self.sch.dlog_alpha_dt(TS)
        assert float(jnp.max(jnp.abs(self.sch.g2(TS) - expected))) < 1e-4

    def test_notebook_beta_is_half_g2_over_sigma(self):
        # the identity that makes the notebook ODE the prob-flow ODE
        lhs = self.sch.beta(TS)
        rhs = 0.5 * self.sch.g2(TS) / self.sch.sigma(TS)
        assert float(jnp.max(jnp.abs(lhs - rhs))) < 1e-3

    def test_g2_matches_variance_ode_autodiff(self):
        # g2 = d(sigma^2)/dt - 2 dlog_alpha sigma^2 via autodiff, both kinds
        for sch in (VPSchedule(kind="stable"), self.sch):
            dsig2 = jax.vmap(jax.grad(lambda t: sch.sigma(t) ** 2))(TS)
            expected = dsig2 - 2 * sch.dlog_alpha_dt(TS) * sch.sigma(TS) ** 2
            err = jnp.abs(sch.g2(TS) - expected)
            assert float(jnp.max(err)) < 5e-2, sch.kind

    def test_kinds_never_mixed(self):
        with pytest.raises(ValueError):
            VPSchedule(kind="bogus")


class TestDDPM:
    sde = DDPMSchedule(num_timesteps=100)

    def test_beta_linspace(self):
        np.testing.assert_allclose(np.asarray(self.sde.betas),
                                   np.linspace(1e-4, 0.02, 100,
                                               dtype=np.float32), rtol=1e-6)

    def test_cumprod_and_prev(self):
        ac = np.asarray(self.sde.alphas_cumprod)
        np.testing.assert_allclose(ac, np.cumprod(1 - np.asarray(self.sde.betas)),
                                   rtol=1e-5)
        prev = np.asarray(self.sde.alphas_cumprod_prev)
        assert prev[0] == 1.0
        np.testing.assert_allclose(prev[1:], ac[:-1], rtol=1e-6)

    def test_posterior_variance(self):
        b = np.asarray(self.sde.betas)
        ac = np.asarray(self.sde.alphas_cumprod)
        acp = np.asarray(self.sde.alphas_cumprod_prev)
        np.testing.assert_allclose(np.asarray(self.sde.posterior_variance),
                                   b * (1 - acp) / (1 - ac), rtol=1e-5)

    def test_q_sample_moments(self, key):
        x0 = jnp.full((4096, 4), 2.0)
        t = jnp.full((4096,), 50, jnp.int32)
        xt, _ = self.sde.q_sample(key, x0, t)
        a = float(self.sde.sqrt_alphas_cumprod[50])
        s = float(self.sde.sqrt_one_minus_alphas_cumprod[50])
        assert abs(float(xt.mean()) - 2.0 * a) < 0.05
        assert abs(float(xt.std()) - s) < 0.05

    def test_fd_sde_tables_finite_and_signed(self):
        f, g2 = self.sde.fd_sde_tables()
        assert bool(jnp.all(jnp.isfinite(f))) and bool(jnp.all(jnp.isfinite(g2)))
        assert bool(jnp.all(f <= 0))   # log alpha decreases
        assert bool(jnp.all(g2 >= 1e-8))

    def test_sde_coeffs_canonical_convention(self):
        f_c, g2 = self.sde.sde_coeffs(jnp.asarray(7))
        assert abs(float(f_c) + 0.5 * float(self.sde.betas[7])) < 1e-8
        assert abs(float(g2) - float(self.sde.betas[7])) < 1e-8

    def test_discrete_cosine_schedule(self):
        """Improved DDPM eq. 17 discrete cosine betas (beyond-ref):
        abar follows the shifted-cosine closed form exactly (up to the
        0.999 beta clip near T) and betas stay in (0, 0.999]."""
        T = 200
        sde = DDPMSchedule(num_timesteps=T, beta_schedule="cosine")
        b = np.asarray(sde.betas)
        assert (b > 0).all() and (b <= 0.999).all()
        assert b[-1] > b[0]  # monotone-increasing noise rate overall
        s = 0.008
        steps = np.arange(T + 1, dtype=np.float64)
        f = np.cos((steps / T + s) / (1 + s) * np.pi / 2) ** 2
        expected_abar = (f / f[0])[1:]
        # the clip only bites at the very end; compare the unclipped region
        got = np.asarray(sde.alphas_cumprod)
        np.testing.assert_allclose(got[:-5], expected_abar[:-5],
                                   rtol=1e-4, atol=1e-6)
        with pytest.raises(ValueError, match="beta_schedule"):
            DDPMSchedule(beta_schedule="quad").betas


def test_ddim_table_grid():
    sch = VPSchedule()
    tbl = sch.ddim_table(50)
    assert tbl.shape == (50, 4)
    ts = jnp.linspace(1.0, 1e-3, 51)
    np.testing.assert_allclose(np.asarray(tbl[:, 0]),
                               np.asarray(sch.alpha(ts[:-1])), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tbl[:, 3]),
                               np.asarray(sch.sigma(ts[1:])), rtol=1e-6)


class TestVPRectified:
    """kind="rectified": the flow-matching linear interpolant
    x_t = (1-t) x0 + t eps (Liu et al. 2022 / Lipman et al. 2022,
    beyond-reference). The bundle must satisfy the same internal identities
    as the VP kinds so every downstream consumer (ddim, E-M, prob-flow ODE,
    log_likelihood) works on it unchanged."""

    sch = VPSchedule(kind="rectified")
    T = jnp.linspace(1e-3, 0.99, 64)  # g2 diverges at t=1 by design

    def test_linear_interpolant(self):
        np.testing.assert_allclose(np.asarray(self.sch.alpha(self.T)),
                                   np.asarray(1.0 - self.T), atol=1e-5)
        np.testing.assert_allclose(np.asarray(self.sch.sigma(self.T)),
                                   np.asarray(self.T), atol=1e-5)

    def test_dlog_alpha_matches_autodiff(self):
        g = jax.vmap(jax.grad(lambda t: self.sch.log_alpha(t)))(self.T)
        err = jnp.abs(g - self.sch.dlog_alpha_dt(self.T))
        # relative: dloga itself reaches -100 near t=0.99
        assert float(jnp.max(err / jnp.abs(g))) < 1e-4

    def test_g2_satisfies_variance_ode(self):
        # d(sigma^2)/dt = 2 dloga sigma^2 + g^2, with autodiff d(sigma^2)/dt
        dvar = jax.vmap(jax.grad(lambda t: self.sch.sigma(t) ** 2))(self.T)
        rhs = (2.0 * self.sch.dlog_alpha_dt(self.T) * self.sch.sigma(self.T) ** 2
               + self.sch.g2(self.T))
        np.testing.assert_allclose(np.asarray(dvar), np.asarray(rhs),
                                   rtol=1e-3, atol=1e-3)

    def test_t_of_sigma_inverts(self):
        np.testing.assert_allclose(
            np.asarray(self.sch.t_of_sigma(self.sch.sigma(self.T))),
            np.asarray(self.T), atol=1e-5)

    def test_ddim_preserves_standard_normal(self, key):
        """The deterministic DDIM update is the straight-line rectified-flow
        step; with the optimal Gaussian closure eps = s x / (a^2 + s^2) it
        must carry N(0, a^2+s^2) at t_max to N(0, 1) at t_min."""
        from composable_diffusion_models_tpu import samplers
        sch = self.sch
        t_max = 0.999

        def eps_fn(x, t):
            a, s = sch.alpha(t), sch.sigma(t)
            return s * x / (a**2 + s**2)

        var0 = float(sch.alpha(t_max) ** 2 + sch.sigma(t_max) ** 2)
        x_init = jnp.sqrt(var0) * jax.random.normal(key, (512, 2))
        out = samplers.ddim(eps_fn, sch, x_init, 100, clip=None, t_max=t_max)
        assert abs(float(out.std()) - 1.0) < 0.1
        assert abs(float(out.mean())) < 0.1

    def test_em_sde_preserves_standard_normal(self, key):
        from composable_diffusion_models_tpu import samplers
        sch = self.sch
        t_max = 0.99  # E-M takes uniform dt through the stiff tail

        def eps_fn(x, t):
            a, s = sch.alpha(t), sch.sigma(t)
            return s * x / (a**2 + s**2)

        var0 = float(sch.alpha(t_max) ** 2 + sch.sigma(t_max) ** 2)
        x_init = jnp.sqrt(var0) * jax.random.normal(key, (512, 2))
        out = samplers.euler_maruyama(eps_fn, sch, jax.random.fold_in(key, 1),
                                      x_init, 400, t_max=t_max)
        assert abs(float(out.std()) - 1.0) < 0.12
        assert abs(float(out.mean())) < 0.1

    def test_log_likelihood_recovers_gaussian_density(self, key):
        """NLL evaluator under the rectified kind: for x0 ~ N(0, I) the
        analytic time-t marginal is N(0, a^2 + s^2)."""
        from composable_diffusion_models_tpu import samplers
        sch = self.sch
        t_max = 0.99

        def score_fn(x, t):
            return -x / (sch.alpha(t) ** 2 + sch.sigma(t) ** 2)

        x = jax.random.normal(key, (8, 2))
        ll, _ = samplers.log_likelihood(score_fn, sch, x, 400, exact=True,
                                        t_max=t_max)
        var = sch.alpha(1e-3) ** 2 + sch.sigma(1e-3) ** 2
        analytic = (-0.5 * jnp.sum(x * x, axis=-1) / var
                    - jnp.log(2 * jnp.pi * var))
        np.testing.assert_allclose(np.asarray(ll), np.asarray(analytic),
                                   atol=3e-2)
