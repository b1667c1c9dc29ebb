"""Sampler tests against analytic Gaussian fixtures (SURVEY.md §4a/§7.4):
for x0 ~ N(0, I) the optimal eps-predictor and score are closed-form, so each
integrator's output distribution is checkable without training."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from composable_diffusion_models_tpu import compose, samplers
from composable_diffusion_models_tpu.schedules import DDPMSchedule, VPSchedule

SCH = VPSchedule()
BS = 512


def gaussian_eps_fn(x, t):
    """E[eps | x_t] for x0 ~ N(0, I) under a VP schedule: eps = sigma_t x."""
    return SCH.sigma(t) * x


def test_ddim_preserves_standard_normal(key):
    x_init = jax.random.normal(key, (BS, 2))
    out = samplers.ddim(gaussian_eps_fn, SCH, x_init, 100, clip=None)
    assert abs(float(out.std()) - 1.0) < 0.1
    assert abs(float(out.mean())) < 0.1


def test_ddim_x0_prediction_matches_eps_prediction(key):
    """The two DDIM parameterizations are the same sampler when the
    closures are algebraically consistent: x0_fn = (x - sigma*eps_fn)/alpha
    (the reference's cross-attention model is an x0-predictor,
    cross_attention.py:259,301-313)."""
    x_init = jax.random.normal(key, (64, 2))

    def x0_fn(x, t):
        return (x - SCH.sigma(t) * gaussian_eps_fn(x, t)) / SCH.alpha(t)

    out_eps = samplers.ddim(gaussian_eps_fn, SCH, x_init, 50, clip=None)
    out_x0 = samplers.ddim(x0_fn, SCH, x_init, 50, clip=None, predict="x0")
    np.testing.assert_allclose(np.asarray(out_x0), np.asarray(out_eps),
                               rtol=2e-4, atol=2e-4)

    # v-parameterization (Salimans & Ho): v = alpha*eps - sigma*x0 — same
    # sampler again through the stable-VP identities
    def v_fn(x, t):
        return SCH.alpha(t) * gaussian_eps_fn(x, t) - SCH.sigma(t) * x0_fn(x, t)

    out_v = samplers.ddim(v_fn, SCH, x_init, 50, clip=None, predict="v")
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_eps),
                               rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="predict"):
        samplers.ddim(x0_fn, SCH, x_init, 5, predict="score")
    from composable_diffusion_models_tpu.schedules import VPSchedule as _VPS
    with pytest.raises(ValueError, match="stable"):
        samplers.ddim(v_fn, _VPS(kind="jax_faithful"), x_init, 5, predict="v")


def test_classifier_guidance_is_bayes_rule_at_scale_1(key):
    """2-Gaussian mixture x0|y=k ~ N(((-1)^k+1) m, I): at scale 1, guiding
    the MARGINAL eps with grad log p(y=1|x_t) is exactly Bayes' rule, so the
    guided sampler must produce the class-1 conditional N(+m, I). Uses the
    stable-VP identity alpha^2 + sigma^2 = 1 (x_t|y ~ N(+-alpha m, I))."""
    m = jnp.asarray([2.0, 0.0])

    def marginal_eps(x, t):
        a, s = SCH.alpha(t), SCH.sigma(t)
        # E[x0|x_t] = tanh(alpha m.x) m  =>  eps = (x - a E[x0|x])/s... the
        # marginal score is -(x - a tanh(a m.x) m) (unit covariance), and
        # eps = -sigma * score
        m_eff = jnp.tanh(a * (x @ m))[:, None] * m[None, :]
        return s * (x - a * m_eff)

    def logp_y1(x, t):
        # p(y=1|x_t) = sigmoid(2 alpha m.x)
        return jax.nn.log_sigmoid(2.0 * SCH.alpha(t) * (x @ m))

    guided = samplers.make_classifier_guided_eps_fn(
        marginal_eps, SCH, logp_y1, scale=1.0)
    x_init = jax.random.normal(key, (BS, 2))
    out = samplers.ddim(guided, SCH, x_init, 200, clip=None)
    mean = np.asarray(out.mean(axis=0))
    np.testing.assert_allclose(mean, np.asarray(m), atol=0.15)
    assert abs(float(out.std(axis=0)[1]) - 1.0) < 0.15
    # unguided control: the marginal is symmetric, mean ~ 0
    out_u = samplers.ddim(marginal_eps, SCH, x_init, 200, clip=None)
    assert abs(float(out_u[:, 0].mean())) < 0.5
    # t-scheduled scale: a callable that returns 0 everywhere must be
    # bit-identical to the unguided sampler (the 'cfg late' gate of
    # eval_composition --t_switch rides this path)
    gated = samplers.make_classifier_guided_eps_fn(
        marginal_eps, SCH, logp_y1, scale=lambda t: 0.0 * (t < 0.0))
    out_g = samplers.ddim(gated, SCH, x_init, 50, clip=None)
    out_ref = samplers.ddim(marginal_eps, SCH, x_init, 50, clip=None)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_ref))
    # and a late-only schedule still steers toward the class-1 component
    late = samplers.make_classifier_guided_eps_fn(
        marginal_eps, SCH, logp_y1, scale=lambda t: 1.0 * (t < 0.5))
    out_l = samplers.ddim(late, SCH, x_init, 200, clip=None)
    assert float(out_l[:, 0].mean()) > 1.0


def test_x0_loss_targets_clean_image(key):
    """make_loss_fn(predict='x0') scores the output against x0, not eps: a
    zero predictor's loss equals E[x0^2] (vs ~1 = E[eps^2] for eps mode)."""
    from composable_diffusion_models_tpu import train
    x0 = jnp.full((128, 2), 0.1)
    zero_apply = lambda params, x, t: jnp.zeros_like(x)
    l_x0 = train.make_loss_fn(zero_apply, SCH, predict="x0")(
        None, key, x0)
    l_eps = train.make_loss_fn(zero_apply, SCH)(None, key, x0)
    assert abs(float(l_x0) - 0.01) < 2e-3   # mean(x0^2) = 0.01
    assert abs(float(l_eps) - 1.0) < 0.1    # mean(eps^2) = 1
    with pytest.raises(ValueError, match="predict"):
        train.make_loss_fn(zero_apply, SCH, predict="score")


def test_euler_maruyama_preserves_standard_normal(key):
    x_init = jax.random.normal(key, (BS, 2))
    out = samplers.euler_maruyama(gaussian_eps_fn, SCH, key, x_init, 200)
    assert abs(float(out.std()) - 1.0) < 0.15
    assert abs(float(out.mean())) < 0.1


def test_prob_flow_ode_preserves_standard_normal(key):
    x_init = jax.random.normal(key, (BS, 2))
    score_fn = lambda x, t: -gaussian_eps_fn(x, t) / SCH.sigma(t)
    out = samplers.prob_flow_ode(score_fn, SCH, x_init, 200)
    assert abs(float(out.std()) - 1.0) < 0.1


def test_ddpm_ancestral_standard_normal(key):
    sde = DDPMSchedule(num_timesteps=100)

    def eps_fn(x, ti):
        return sde.sqrt_one_minus_alphas_cumprod[ti] * x

    x_init = jax.random.normal(key, (BS, 2))
    out = samplers.ddpm_ancestral(eps_fn, sde, jax.random.fold_in(key, 1),
                                  x_init, clip=None)
    assert abs(float(out.std()) - 1.0) < 0.1


def test_superdiff_identical_experts_equals_single(key):
    """With K identical experts any kappa convexly sums to the single score,
    so SUPERDIFF must reproduce ddpm_ancestral bit-for-bit (same key)."""
    sde = DDPMSchedule(num_timesteps=50)

    def eps_fn(x, ti):
        return sde.sqrt_one_minus_alphas_cumprod[ti] * x

    def eps_stack_fn(x, ti):
        e = eps_fn(x, ti)
        return jnp.stack([e, e])

    x_init = jax.random.normal(key, (16, 2))
    k2 = jax.random.fold_in(key, 7)
    a = samplers.superdiff(eps_stack_fn, sde, k2, x_init, "OR", clip=None)
    b = samplers.ddpm_ancestral(eps_fn, sde, k2, x_init, clip=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_superdiff_or_favors_denser_expert(key):
    """OR with a tight expert (x0 = delta(mu)) vs a broad one: samples should
    split toward the modes rather than average them."""
    sde = DDPMSchedule(num_timesteps=100)
    mu = jnp.array([2.0, 0.0])

    def eps_point(mu):
        # x_t = sqrt(abar) mu + sqrt(1-abar) eps -> E[eps|x_t] exact
        def fn(x, ti):
            sa = sde.sqrt_alphas_cumprod[ti]
            s1m = sde.sqrt_one_minus_alphas_cumprod[ti]
            return (x - sa * mu) / s1m
        return fn

    f1, f2 = eps_point(mu), eps_point(-mu)
    stack_fn = lambda x, ti: jnp.stack([f1(x, ti), f2(x, ti)])
    x_init = jax.random.normal(key, (128, 2))
    out = samplers.superdiff(stack_fn, sde, jax.random.fold_in(key, 3),
                             x_init, "OR", clip=None)
    # every sample should be near one of the two modes, not near the midpoint
    d1 = jnp.linalg.norm(out - mu, axis=1)
    d2 = jnp.linalg.norm(out + mu, axis=1)
    assert float(jnp.minimum(d1, d2).mean()) < 1.0
    # both modes populated
    assert 0.1 < float((d1 < d2).mean()) < 0.9


def test_superdiff_and_solve_runs_between_modes(key):
    sde = DDPMSchedule(num_timesteps=100)
    mu = jnp.array([1.0, 0.0])

    def eps_point(m):
        def fn(x, ti):
            sa = sde.sqrt_alphas_cumprod[ti]
            s1m = sde.sqrt_one_minus_alphas_cumprod[ti]
            return (x - sa * m) / s1m
        return fn

    stack_fn = lambda x, ti: jnp.stack([eps_point(mu)(x, ti),
                                        eps_point(-mu)(x, ti)])
    x_init = jax.random.normal(key, (32, 2))
    out = samplers.superdiff_and_solve(stack_fn, sde,
                                       jax.random.fold_in(key, 4),
                                       x_init, mode="AND")
    assert bool(jnp.all(jnp.isfinite(out)))
    # AND seeks the equal-density locus (x-axis midline here)
    assert abs(float(out[:, 0].mean())) < 0.6


def test_ito_kappa_ode_equal_density_locus(key):
    """Two point-mass experts at +/-mu: the Ito-kappa AND path should end
    near the perpendicular bisector (|x . e1| small)."""
    sch = VPSchedule(kind="jax_faithful")
    mu = jnp.array([1.0, 0.0])

    def score_fn(m):
        # sdlogqdx = sigma * grad log N(alpha m, sigma^2 I) = (alpha m - x)/sigma
        def fn(x, t):
            return (sch.alpha(t) * m - x) / sch.sigma(t)
        return fn

    x_init = jax.random.normal(key, (64, 2))
    out = samplers.ito_kappa_ode((score_fn(mu), score_fn(-mu)), sch,
                                 jax.random.fold_in(key, 5), x_init, 200)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert abs(float(out[:, 0].mean())) < 0.3


def test_superposition_2d_identical_experts_equal_ll(key):
    sch = VPSchedule(kind="jax_faithful")
    fn = lambda x, t: (sch.alpha(t) * jnp.array([0.5, 0.5]) - x) / sch.sigma(t)
    x_init = jax.random.normal(key, (32, 2))
    out, ll = samplers.superposition_2d((fn, fn), sch, key, x_init, 100)
    np.testing.assert_allclose(np.asarray(ll[0]), np.asarray(ll[1]),
                               rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_layout_identical_experts_mask_invariance(key):
    sde = DDPMSchedule(num_timesteps=50)

    def eps_fn(x, ti):
        return sde.sqrt_one_minus_alphas_cumprod[ti] * x

    stack2 = lambda x, ti: jnp.stack([eps_fn(x, ti), eps_fn(x, ti)])
    stack1 = lambda x, ti: jnp.stack([eps_fn(x, ti)])
    x_init = jax.random.normal(key, (4, 8, 8, 3))
    half = jnp.zeros((8, 8)).at[:4].set(1.0)
    a = samplers.layout(stack2, sde, key, x_init,
                        jnp.stack([jnp.ones((8, 8)), half]))
    b = samplers.layout(stack1, sde, key, x_init, jnp.ones((1, 8, 8)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cfg_eps_fn_zero_weights_is_uncond(key):
    calls = {}

    def apply_fn(x, t, lab):
        calls["labels"] = lab
        return x * (1.0 + lab.astype(x.dtype).reshape(-1, 1))

    fn = samplers.make_cfg_eps_fn(apply_fn,
                                  [(jnp.asarray(0),), (jnp.asarray(1),)],
                                  (jnp.asarray(2),), jnp.array([0.0, 0.0]))
    x = jax.random.normal(key, (3, 4))
    out = fn(x, jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x * 3.0), rtol=1e-5)
    # fan-out batched into ONE forward: labels length = (K+1) * B
    assert calls["labels"].shape[0] == 9


def test_superdiff_fixed_kappa(key):
    from composable_diffusion_models_tpu.schedules import DDPMSchedule
    sde = DDPMSchedule(num_timesteps=10)

    def eps_stack_fn(x, t):
        return jnp.stack([x * 0.1, -x * 0.1])

    x0 = jax.random.normal(key, (4, 8, 8, 1))
    out = samplers.superdiff(eps_stack_fn, sde, key, x0, operation="FIXED",
                             kappa_fixed=[0.7, 0.3])
    assert out.shape == x0.shape
    assert bool(jnp.all(jnp.isfinite(out)))


class TestDPMSolverPP:
    """Analytic Gaussian: q0 = N(mu, s^2 I) has exact eps-prediction
    eps*(x,t) = sigma (x - alpha mu) / (alpha^2 s^2 + sigma^2); a perfect
    integrator recovers N(mu, s^2)."""

    mu, s = 1.5, 0.5

    def exact_eps(self, sch):
        def eps(x, t):
            a, sg = sch.alpha(t), sch.sigma(t)
            return sg * (x - a * self.mu) / (a**2 * self.s**2 + sg**2)
        return eps

    def moment_err(self, x):
        return (abs(float(x.mean()) - self.mu)
                + abs(float(x.std()) - self.s))

    def test_first_order_step_equals_ddim(self, key):
        sch = VPSchedule()
        eps = self.exact_eps(sch)
        x0 = jax.random.normal(key, (256, 4))
        a = samplers.ddim(eps, sch, x0, 1, clip=None)
        b = samplers.dpm_solver_pp_2m(eps, sch, x0, 1, clip=None)
        assert jnp.allclose(a, b, atol=1e-5), float(jnp.abs(a - b).max())

    def test_converges_and_beats_ddim_at_few_steps(self, key):
        sch = VPSchedule()
        eps = self.exact_eps(sch)
        x0 = jax.random.normal(key, (4096, 4))
        err_dpm = self.moment_err(
            samplers.dpm_solver_pp_2m(eps, sch, x0, 10, clip=None))
        err_ddim = self.moment_err(samplers.ddim(eps, sch, x0, 10, clip=None))
        assert err_dpm < err_ddim, (err_dpm, err_ddim)
        err_50 = self.moment_err(
            samplers.dpm_solver_pp_2m(eps, sch, x0, 50, clip=None))
        assert err_50 < 0.05, err_50


class TestStochasticDDIM:
    def test_eta_zero_bitwise_identical(self, key):
        x0 = jax.random.normal(key, (64, 4))
        a = samplers.ddim(gaussian_eps_fn, SCH, x0, 20, clip=None)
        b = samplers.ddim(gaussian_eps_fn, SCH, x0, 20, clip=None, eta=0.0,
                          key=key)
        assert bool(jnp.all(a == b))

    def test_eta_requires_key(self, key):
        x0 = jax.random.normal(key, (4, 4))
        with pytest.raises(ValueError):
            samplers.ddim(gaussian_eps_fn, SCH, x0, 4, eta=0.5)

    def test_eta_one_preserves_standard_normal(self, key):
        x0 = jax.random.normal(key, (4096, 4))
        out = samplers.ddim(gaussian_eps_fn, SCH, x0, 100, clip=None,
                            eta=1.0, key=jax.random.fold_in(key, 1))
        assert abs(float(out.mean())) < 0.1
        assert abs(float(out.std()) - 1.0) < 0.1

    def test_eta_stochastic_varies_with_key(self, key):
        x0 = jax.random.normal(key, (16, 4))
        a = samplers.ddim(gaussian_eps_fn, SCH, x0, 10, clip=None, eta=0.7,
                          key=jax.random.fold_in(key, 1))
        b = samplers.ddim(gaussian_eps_fn, SCH, x0, 10, clip=None, eta=0.7,
                          key=jax.random.fold_in(key, 2))
        assert not bool(jnp.allclose(a, b))


def test_superdiff_and_solve_k3(key):
    """K=3 AND linear system (beyond-reference) runs and stays finite."""
    sde = DDPMSchedule(num_timesteps=20)

    def eps_stack_fn(x, ti):
        # time-varying experts so the per-step drift/score inner products in
        # the KxK system actually change along the trajectory
        t = ti.astype(jnp.float32) / 20.0
        return jnp.stack([x * 0.1 * (1.0 + t), x * 0.2, -x * 0.1 * t])

    x0 = jax.random.normal(key, (8, 4))
    out = samplers.superdiff_and_solve(eps_stack_fn, sde, key, x0,
                                       mode="AND", k_experts=3)
    assert out.shape == x0.shape
    assert bool(jnp.all(jnp.isfinite(out)))


class TestParallelPicard:
    """Parallel-in-time Picard prob-flow (samplers.parallel_prob_flow,
    beyond-reference, arXiv:2305.16317): converges to the sequential Euler
    solve with far fewer sequential sweeps than steps."""

    def test_matches_sequential_on_exact_gaussian(self, key):
        sch = VPSchedule()

        def score_fn(x, t):
            # exact score of the diffused N(0, I): s = -x (alpha^2+sigma^2=1)
            return -x

        x_init = jax.random.normal(key, (64, 2))
        ref = samplers.prob_flow_ode(score_fn, sch, x_init, 100)
        out, resid = samplers.parallel_prob_flow(score_fn, sch, x_init, 100,
                                                 n_iters=25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)
        # contraction: residuals decrease and the tail is tiny
        r = np.asarray(resid)
        assert r[-1] < 1e-3 * max(r[0], 1e-9)

    def test_sequential_depth_much_smaller_than_steps(self, key):
        """25 sweeps reproduce a 100-step solve: 4x fewer sequential model
        evaluations (the whole point of parallel-in-time sampling)."""
        from composable_diffusion_models_tpu.models import ScoreMLP
        sch = VPSchedule()
        m = ScoreMLP(hidden=32, depth=2, out_dim=2)
        p = m.init(key, jnp.ones((1, 1)), jnp.zeros((1, 2)))

        def score_fn(x, t):
            return -m.apply(p, t, x) / sch.sigma(t).reshape(-1, 1)

        x_init = jax.random.normal(key, (32, 2))
        ref = samplers.prob_flow_ode(score_fn, sch, x_init, 100)
        out, resid = samplers.parallel_prob_flow(score_fn, sch, x_init, 100,
                                                 n_iters=25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2)


class TestLogLikelihood:
    """Prob-flow ODE likelihood vs an analytic Gaussian (beyond-reference).

    For x0 ~ N(mu, s^2 I) the time-t marginal is N(alpha mu, alpha^2 s^2 +
    sigma^2) with a closed-form score, so log_likelihood must recover the
    analytic log-density at t_min up to O(dt) discretization error."""

    MU = jnp.array([0.5, -0.3])
    S = 1.3

    def _score_fn(self, x, t):
        var = SCH.alpha(t) ** 2 * self.S ** 2 + SCH.sigma(t) ** 2
        return -(x - SCH.alpha(t) * self.MU) / var

    def _analytic(self, x, t):
        a, sg = SCH.alpha(jnp.asarray(t)), SCH.sigma(jnp.asarray(t))
        var = a ** 2 * self.S ** 2 + sg ** 2
        d = x - a * self.MU
        return (-0.5 * jnp.sum(d * d, axis=-1) / var
                - jnp.log(2 * jnp.pi * var))

    def test_exact_divergence_matches_analytic_density(self, key):
        x = self.MU + self.S * jax.random.normal(key, (8, 2))
        ll, x_T = samplers.log_likelihood(self._score_fn, SCH, x, 400,
                                          exact=True)
        np.testing.assert_allclose(np.asarray(ll),
                                   np.asarray(self._analytic(x, 1e-3)),
                                   atol=2e-2)
        # terminal latent has marched to the (whitened) prior scale
        assert abs(float(x_T.std()) - 1.0) < 0.35

    def test_rademacher_hutchinson_is_exact_for_isotropic_jacobian(self, key):
        """The Gaussian score's Jacobian is c(t) I, so v^T J v = c * D exactly
        for Rademacher probes — the estimator must agree with exact mode to
        float tolerance, pinning the probe/jvp plumbing inside the scan."""
        x = self.MU + self.S * jax.random.normal(key, (4, 2))
        ll_e, _ = samplers.log_likelihood(self._score_fn, SCH, x, 100,
                                          exact=True)
        ll_h, _ = samplers.log_likelihood(self._score_fn, SCH, x, 100,
                                          key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(ll_h), np.asarray(ll_e),
                                   rtol=1e-4, atol=1e-4)

    def test_requires_key_unless_exact(self, key):
        x = jax.random.normal(key, (2, 2))
        with pytest.raises(ValueError, match="PRNG key"):
            samplers.log_likelihood(self._score_fn, SCH, x, 10)

    def test_bits_per_dim_convention(self):
        # log_p = 0 nats => bpd = log2(nbins/2) exactly; shape-dim scaling
        bpd = samplers.bits_per_dim(jnp.zeros((3,)), (28, 28, 1))
        np.testing.assert_allclose(np.asarray(bpd), np.log2(128.0))
        # one nat over D dims shifts bpd by -1/(D ln 2)
        bpd1 = samplers.bits_per_dim(jnp.ones((1,)), (2,))
        np.testing.assert_allclose(float(bpd1[0]),
                                   np.log2(128.0) - 1 / (2 * np.log(2)),
                                   rtol=1e-6)


class TestLangevinCorrector:
    """ddim(corrector_steps>0) = predictor-corrector (Song et al. alg. 4).

    With the analytic Gaussian eps closure, deterministic DDIM is a LINEAR
    map: a mis-scaled initialization rides through untouched (std 2 in ->
    std 2 out). The Langevin corrector re-equilibrates toward the true
    marginal at every level, so the same run must land near std 1 — the
    distribution-correcting property that motivates MCMC for composed
    (non-gradient) score fields (Du et al. 2023)."""

    def test_corrector_preserves_standard_normal(self, key):
        x_init = jax.random.normal(key, (BS, 2))
        out = samplers.ddim(gaussian_eps_fn, SCH, x_init, 20, clip=None,
                            key=jax.random.PRNGKey(1), corrector_steps=2)
        assert abs(float(out.std()) - 1.0) < 0.1
        assert abs(float(out.mean())) < 0.1

    def test_corrector_fixes_misscaled_trajectory(self, key):
        x_init = 2.0 * jax.random.normal(key, (BS, 2))
        plain = samplers.ddim(gaussian_eps_fn, SCH, x_init, 10, clip=None)
        assert float(plain.std()) > 1.5  # linear map keeps the bad scale
        pc = samplers.ddim(gaussian_eps_fn, SCH, x_init, 10, clip=None,
                           key=jax.random.PRNGKey(1), corrector_steps=10,
                           corrector_snr=0.3)
        assert abs(float(pc.std()) - 1.0) < 0.15

    def test_corrector_composes_with_x0_prediction(self, key):
        """to_eps conversion inside the corrector: an algebraically
        consistent x0 closure must give the same PC trajectory as eps."""
        x_init = jax.random.normal(key, (64, 2))

        def x0_fn(x, t):
            return (x - SCH.sigma(t) * gaussian_eps_fn(x, t)) / SCH.alpha(t)

        kw = dict(clip=None, key=jax.random.PRNGKey(2), corrector_steps=3)
        out_eps = samplers.ddim(gaussian_eps_fn, SCH, x_init, 25, **kw)
        out_x0 = samplers.ddim(x0_fn, SCH, x_init, 25, predict="x0", **kw)
        np.testing.assert_allclose(np.asarray(out_x0), np.asarray(out_eps),
                                   rtol=2e-4, atol=2e-4)

    def test_corrector_requires_key(self, key):
        x = jax.random.normal(key, (4, 2))
        with pytest.raises(ValueError, match="corrector"):
            samplers.ddim(gaussian_eps_fn, SCH, x, 5, corrector_steps=1)

    def test_corrector_t_max_gates_to_identity(self, key):
        """corrector_t_max=0 zeroes every Langevin step size: the PC run
        must be bit-identical to the plain predictor; an intermediate
        threshold (low-noise-only correction) still fixes a mis-scaled
        trajectory (the VERDICT-r2 lever: full-range correction harmed the
        composed samplers, so the gate must leave the tail working)."""
        x_init = 2.0 * jax.random.normal(key, (BS, 2))
        plain = samplers.ddim(gaussian_eps_fn, SCH, x_init, 10, clip=None)
        gated_off = samplers.ddim(gaussian_eps_fn, SCH, x_init, 10,
                                  clip=None, key=jax.random.PRNGKey(1),
                                  corrector_steps=3, corrector_t_max=0.0)
        np.testing.assert_array_equal(np.asarray(gated_off),
                                      np.asarray(plain))
        tail_only = samplers.ddim(gaussian_eps_fn, SCH, x_init, 10,
                                  clip=None, key=jax.random.PRNGKey(1),
                                  corrector_steps=10, corrector_snr=0.3,
                                  corrector_t_max=0.5)
        assert abs(float(tail_only.std()) - 1.0) < 0.2
