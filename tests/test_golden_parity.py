"""Golden parity vs the PyTorch reference (SURVEY.md §4b).

These tests import the reference's OWN torch code (read-only at
/root/reference; only modules whose imports are satisfiable: pure-torch
schedule files and the SuperDiffSampler class) and compare numerically
against this framework at fixed inputs. Stochastic paths are compared with
noise zeroed (different PRNGs preclude bitwise noise parity — SURVEY §7.4).
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/mnist")
sys.path.insert(0, "/root/reference/shapes")

from composable_diffusion_models_tpu.schedules import DDPMSchedule, VPSchedule

TS = np.linspace(1e-3, 1.0, 50, dtype=np.float32)


class TestContinuousScheduleParity:
    """vs /root/reference/mnist/schedule.py (stable) and
    shapes/schedule_jax_faithful.py (sigma = t)."""

    def test_stable_schedule(self):
        import schedule as ref  # mnist/schedule.py
        ours = VPSchedule(kind="stable")
        t_torch = torch.tensor(TS)
        np.testing.assert_allclose(np.asarray(ours.log_alpha(TS)),
                                   ref.log_alpha(t_torch).numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.sigma(TS)),
                                   ref.sigma(t_torch).numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours.dlog_alpha_dt(TS)),
                                   ref.dlog_alphadt(t_torch).numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.beta(TS)),
                                   ref.beta(t_torch).numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_stable_q_t_fixed_eps(self):
        import schedule as ref
        ours = VPSchedule(kind="stable")
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        eps = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        t = np.full((4,), 0.37, np.float32)
        ref_xt, _ = ref.q_t(torch.tensor(x0), torch.tensor(t),
                            torch.tensor(eps))
        # ours is NHWC
        our_xt = ours.q_t_eps(jnp.asarray(x0.transpose(0, 2, 3, 1)), t,
                              jnp.asarray(eps.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(our_xt).transpose(0, 3, 1, 2),
                                   ref_xt.numpy(), atol=1e-5)

    def test_jax_faithful_schedule(self):
        import schedule_jax_faithful as ref
        ours = VPSchedule(kind="jax_faithful")
        t_torch = torch.tensor(TS)
        np.testing.assert_allclose(np.asarray(ours.sigma(TS)),
                                   ref.sigma(t_torch).numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours.beta(TS)),
                                   ref.beta(t_torch).numpy(),
                                   rtol=1e-4, atol=1e-4)
        # g2 deliberately NOT compared: the reference's formula contradicts
        # its own derivation comment (sign flip) — see VPSchedule.g2.

    def test_stable_g2(self):
        import schedule_2 as ref  # shapes/schedule_2.py
        ours = VPSchedule(kind="stable")
        t_torch = torch.tensor(TS)
        np.testing.assert_allclose(np.asarray(ours.g2(TS)),
                                   ref.g2(t_torch).numpy(), atol=1e-5)


def _ref_superdiff_sampler():
    sys.path.insert(0, "/root/reference/src/diffusion")
    import samplers as ref_samplers
    return ref_samplers.SuperDiffSampler


class _EpsModel(torch.nn.Module):
    """Exact eps-predictor for x0 ~ N(0, I): eps = sqrt(1-abar_t) x."""

    def __init__(self, s1m):
        super().__init__()
        self.s1m = s1m

    def forward(self, x, t):
        return self.s1m[t.long()].view(-1, 1, 1, 1) * x


class TestSuperDiffGoldenParity:
    """Run the reference's OWN SuperDiffSampler.sample (torch, noise zeroed)
    against ours (noise_scale=0) from the same x_init; the deterministic
    trajectory — kappa softmax, ancestral mean, log-q updates — must agree."""

    @pytest.mark.parametrize("operation", ["OR", "AND"])
    def test_deterministic_trajectory(self, operation, monkeypatch):
        T = 20
        ours_sde = DDPMSchedule(num_timesteps=T)

        # reference sde namespace built from OUR tables (table parity is
        # covered above and by test_schedules; this test isolates the sampler)
        sde = types.SimpleNamespace(
            num_timesteps=T,
            betas=torch.tensor(np.asarray(ours_sde.betas)),
            alphas=torch.tensor(np.asarray(ours_sde.alphas)),
            alphas_cumprod=torch.tensor(np.asarray(ours_sde.alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=torch.tensor(
                np.asarray(ours_sde.sqrt_one_minus_alphas_cumprod)),
            posterior_variance=torch.tensor(
                np.asarray(ours_sde.posterior_variance)),
        )
        rng = np.random.default_rng(3)
        x_init = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)

        # first torch.randn call is the reference's x_init draw — feed our
        # fixed x_init; every later draw (step noise) is zeroed
        calls = {"n": 0}

        def fake_randn(*s, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                return torch.tensor(x_init)
            shape = s[0] if len(s) == 1 and isinstance(s[0], tuple) else s
            return torch.zeros(*shape)

        monkeypatch.setattr(torch, "randn", fake_randn)
        monkeypatch.setattr(torch, "randn_like",
                            lambda x, **k: torch.zeros_like(x))

        SuperDiff = _ref_superdiff_sampler()
        model = _EpsModel(sde.sqrt_one_minus_alphas_cumprod)
        ref_out = SuperDiff(sde).sample(
            model, model, batch_size=2, shape=(3, 4, 4), device="cpu",
            operation=operation)

        from composable_diffusion_models_tpu import samplers
        import jax

        s1m_table = jnp.asarray(np.asarray(ours_sde.sqrt_one_minus_alphas_cumprod))

        def eps_stack_fn(x, ti):
            e = s1m_table[ti] * x
            return jnp.stack([e, e])

        our_out = samplers.superdiff(
            eps_stack_fn, ours_sde, jax.random.PRNGKey(0),
            jnp.asarray(x_init.transpose(0, 2, 3, 1)),
            operation=operation, noise_scale=0.0)
        np.testing.assert_allclose(
            np.asarray(our_out).transpose(0, 3, 1, 2), ref_out.numpy(),
            atol=1e-4)
