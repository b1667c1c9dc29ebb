"""Noise schedules: the L0 layer of the framework.

TPU-native rebuild of the reference's schedule zoo (see SURVEY.md §2.1):

* ``VPSchedule(kind="stable")``   — continuous VP-SDE with sigma^2 = 1 - alpha^2
  (behavioral parity with /root/reference/mnist/schedule.py:5-62 and
  shapes/schedule_2.py:50-62, which adds g2).
* ``VPSchedule(kind="jax_faithful")`` — sigma(t) = t convention of the original
  JAX notebook (/root/reference/shapes/schedule_jax_faithful.py:21-66,
  notebook/superposition_edu.py:32-39).
* ``DDPMSchedule`` — discrete linear-beta DDPM tables
  (/root/reference/src/composing_colored_mnist.py:23-37 ``VPSDE`` and the
  ``Sampler``/``DiffusionSDE`` variants).

Unlike the reference — which carries three mutually inconsistent beta/g^2
definitions spread over seven copies — each schedule object here is ONE
consistent bundle (alpha, sigma, beta, g2, derivatives) selected by ``kind``;
they are never mixed (SURVEY.md §7.4 "Schedule pitfalls").

Everything is a pure ``jnp`` closed form: under ``jit`` XLA constant-folds the
coefficients, and samplers consume them as precomputed (n_steps,) tables fed to
``lax.scan`` so no schedule math runs on the host inside the hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_STABLE = "stable"
_JAX_FAITHFUL = "jax_faithful"
_COSINE = "cosine"
_RECTIFIED = "rectified"
# cosine shift (Improved DDPM, Nichol & Dhariwal 2021 eq. 17) and the phase
# clamp that replaces the paper's discrete beta_t <= 0.999 clip: alpha at
# t=1 floors at sin(0.02) ~ 0.02 instead of hitting cos(pi/2) = 0 exactly
# (which would 0-divide the x0 estimate in DDIM and blow up g2)
_COS_S = 0.008
_COS_U_MAX = float(jnp.pi) / 2 - 0.02


@dataclasses.dataclass(frozen=True)
class VPSchedule:
    """Continuous-time variance-preserving schedule, t in [0, 1].

    ``kind="stable"``:       sigma^2(t) = 1 - alpha^2(t)   (true VP)
    ``kind="jax_faithful"``: sigma(t) = t                   (notebook original)
    ``kind="cosine"``:       alpha(t) = cos(pi/2 (t+s)/(1+s)) / cos(pi/2 s/(1+s)),
                             true VP (beyond-reference: Improved DDPM eq. 17;
                             phase clamped so alpha(1) > 0 — the continuous
                             analog of the paper's beta <= 0.999 clip)
    ``kind="rectified"``:    alpha(t) = 1 - t, sigma(t) = t — the rectified-
                             flow / flow-matching linear interpolant (Liu et
                             al. 2022, Lipman et al. 2022; beyond-reference).
                             Every consumer (q_t DSM training, ddim, E-M,
                             prob-flow ODE, log_likelihood) is written
                             against alpha/sigma/dlog_alpha_dt/g2, so the
                             whole sampler/composition stack works on this
                             interpolant unchanged; the deterministic DDIM
                             update IS the straight-line rectified-flow step.
                             g^2(t) = 2t/(1-t) diverges at t=1 (alpha -> 0):
                             the grid/table builders clamp t_max to 0.999
                             under this kind so samplers' default t_max=1.0
                             stays finite; log_likelihood callers should
                             pass t_max <= 0.99 themselves.
    """

    beta_0: float = 0.1
    beta_1: float = 20.0
    kind: str = _STABLE
    eps: float = 1e-9

    def __post_init__(self):
        if self.kind not in (_STABLE, _JAX_FAITHFUL, _COSINE, _RECTIFIED):
            raise ValueError(f"unknown schedule kind: {self.kind!r}")

    # --- signal rate -----------------------------------------------------
    def _cos_u(self, t: Array) -> Array:
        return (t + _COS_S) / (1.0 + _COS_S) * (jnp.pi / 2)

    def log_alpha(self, t: Array) -> Array:
        t = jnp.asarray(t, jnp.float32)
        if self.kind == _COSINE:
            u = jnp.minimum(self._cos_u(t), _COS_U_MAX)
            return jnp.log(jnp.cos(u)) - jnp.log(jnp.cos(self._cos_u(0.0)))
        if self.kind == _RECTIFIED:
            return jnp.log(1.0 - t + self.eps)
        return -0.5 * t * self.beta_0 - 0.25 * t**2 * (self.beta_1 - self.beta_0)

    def alpha(self, t: Array) -> Array:
        return jnp.exp(self.log_alpha(t))

    def dlog_alpha_dt(self, t: Array) -> Array:
        t = jnp.asarray(t, jnp.float32)
        if self.kind == _COSINE:
            u_raw = self._cos_u(t)
            u = jnp.minimum(u_raw, _COS_U_MAX)
            # clamped region: alpha is constant there, derivative 0 (matches
            # autodiff through the jnp.minimum in log_alpha)
            return jnp.where(u_raw < _COS_U_MAX,
                             -(jnp.pi / 2) / (1.0 + _COS_S) * jnp.tan(u), 0.0)
        if self.kind == _RECTIFIED:
            return -1.0 / (1.0 - t + self.eps)
        return -0.5 * self.beta_0 - 0.5 * t * (self.beta_1 - self.beta_0)

    # --- noise rate ------------------------------------------------------
    def log_sigma(self, t: Array) -> Array:
        t = jnp.asarray(t, jnp.float32)
        if self.kind in (_JAX_FAITHFUL, _RECTIFIED):  # sigma(t) = t kinds
            return jnp.log(t + self.eps)
        # true-VP kinds: sigma^2 = 1 - alpha^2
        return 0.5 * jnp.log(1.0 - jnp.exp(2.0 * self.log_alpha(t)) + self.eps)

    def sigma(self, t: Array) -> Array:
        if self.kind in (_JAX_FAITHFUL, _RECTIFIED):
            # avoid the exp(log(t)) fp32 round-trip: sigma(t) = t exactly
            return jnp.asarray(t, jnp.float32) + self.eps
        return jnp.exp(self.log_sigma(t))

    # --- SDE coefficients -------------------------------------------------
    def beta(self, t: Array) -> Array:
        """Reverse-SDE diffusion weight.

        stable:       beta(t) = -2 dlog_alpha/dt * sigma^2(t)
        jax_faithful: beta(t) = 1 + 0.5 t b0 + 0.5 t^2 (b1 - b0)  (notebook)
        """
        t = jnp.asarray(t, jnp.float32)
        if self.kind != _JAX_FAITHFUL:  # generic for any true-VP kind
            return -2.0 * self.dlog_alpha_dt(t) * self.sigma(t) ** 2
        return 1.0 + 0.5 * t * self.beta_0 + 0.5 * t**2 * (self.beta_1 - self.beta_0)

    def g2(self, t: Array) -> Array:
        """Forward-SDE squared diffusion coefficient, from the variance ODE
        d(sigma^2)/dt = 2 dlog_alpha sigma^2 + g^2:

        stable:       g^2(t) = -2 dlog_alpha/dt
        jax_faithful: g^2(t) = 2 sigma sigma' - 2 sigma^2 dlog_alpha/dt  (sigma'=1)

        NOTE — the reference's schedule_jax_faithful.py:55-66 codes
        ``2*sigma + 2*sigma^2*dlog_alpha`` (plus sign), contradicting its own
        derivation comment ``g^2 = 2 sigma^2 d/dt log(sigma/alpha)``; we use
        the correct sign, under which the notebook's beta(t) identity
        beta == 0.5 g^2 / sigma holds exactly and the notebook ODE
        (superposition_edu.py:122-126) IS the probability-flow ODE.
        """
        t = jnp.asarray(t, jnp.float32)
        if self.kind == _RECTIFIED:
            # variance ODE with sigma = t, dlog_alpha = -1/(1-t):
            # g^2 = 2t - 2 dloga t^2 = 2t/(1-t)
            return 2.0 * t / (1.0 - t + self.eps)
        if self.kind != _JAX_FAITHFUL:  # generic for any true-VP kind
            return -2.0 * self.dlog_alpha_dt(t)
        s = self.sigma(t)
        return 2.0 * s - 2.0 * s**2 * self.dlog_alpha_dt(t)

    # --- forward process ---------------------------------------------------
    def q_t(self, key: Array, x0: Array, t: Array) -> Tuple[Array, Array]:
        """Sample x_t = alpha(t) x0 + sigma(t) eps. Returns (x_t, eps).

        ``t`` may be a scalar or per-example with shape (B,); coefficients are
        broadcast over trailing data dims.
        """
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return self.q_t_eps(x0, t, eps), eps

    def q_t_eps(self, x0: Array, t: Array, eps: Array) -> Array:
        a = _bcast(self.alpha(t), x0.ndim)
        s = _bcast(self.sigma(t), x0.ndim)
        return a * x0 + s * eps

    # --- inversion ----------------------------------------------------------
    def t_of_sigma(self, sigma: Array) -> Array:
        """Closed-form inverse of sigma(t), per kind (used by the Karras
        timestep spacing). Clipped to [0, 1]."""
        sigma = jnp.asarray(sigma, jnp.float32)
        if self.kind in (_JAX_FAITHFUL, _RECTIFIED):
            return jnp.clip(sigma, 0.0, 1.0)
        la = 0.5 * jnp.log(jnp.clip(1.0 - sigma**2, 1e-12, 1.0))
        if self.kind == _COSINE:
            u0 = self._cos_u(0.0)
            u = jnp.arccos(jnp.clip(jnp.exp(la) * jnp.cos(u0), -1.0, 1.0))
            t = u * 2.0 * (1.0 + _COS_S) / jnp.pi - _COS_S
            return jnp.clip(t, 0.0, 1.0)
        # stable: log_alpha = -0.5 b0 t - 0.25 (b1-b0) t^2, the negative
        # root of the quadratic in t
        db = self.beta_1 - self.beta_0
        disc = 0.25 * self.beta_0**2 - db * la
        t = (-0.5 * self.beta_0 + jnp.sqrt(jnp.maximum(disc, 0.0))) / (0.5 * db)
        return jnp.clip(t, 0.0, 1.0)

    def ddim_grid(self, n_steps: int, t_max: float = 1.0, t_min: float = 1e-3,
                  spacing: str = "linear", rho: float = 7.0) -> Array:
        """(n_steps + 1,) decreasing t grid for DDIM-family samplers.

        ``spacing="linear"`` matches the reference grid
        linspace(1.0, 1e-3, n_steps + 1)
        (/root/reference/shapes/compose_images_ddim.py:37).
        ``spacing="karras"`` places steps uniformly in sigma^(1/rho)
        (Karras et al. 2022 eq. 5, rho = 7 — beyond-reference: concentrates
        steps at low noise where few-step DDIM loses the most quality),
        mapped back through the closed-form ``t_of_sigma``.
        """
        t_max = self._clamp_t_max(t_max)
        if spacing == "linear":
            return jnp.linspace(t_max, t_min, n_steps + 1)
        if spacing != "karras":
            raise ValueError(f"spacing must be 'linear' or 'karras', "
                             f"got {spacing!r}")
        s_max, s_min = self.sigma(t_max), self.sigma(t_min)
        r = jnp.linspace(0.0, 1.0, n_steps + 1)
        sig = (s_max ** (1 / rho)
               + r * (s_min ** (1 / rho) - s_max ** (1 / rho))) ** rho
        return self.t_of_sigma(sig)

    def _clamp_t_max(self, t_max: float) -> float:
        """Rectified-flow alpha hits 0 (and g^2 diverges) at t=1: cap the
        sampler grids at 0.999 so the default t_max=1.0 stays finite."""
        if self.kind == _RECTIFIED:
            return min(t_max, 1.0 - 1e-3)
        return t_max

    # --- precomputed tables for scan-based samplers ------------------------
    def ddim_table(self, n_steps: int, t_max: float = 1.0, t_min: float = 1e-3,
                   spacing: str = "linear", rho: float = 7.0):
        """(n_steps, 4) rows of (alpha_now, sigma_now, alpha_next, sigma_next)
        over ``ddim_grid`` (see there for the spacing options)."""
        ts = self.ddim_grid(n_steps, t_max, t_min, spacing, rho)
        a, s = self.alpha(ts), self.sigma(ts)
        return jnp.stack([a[:-1], s[:-1], a[1:], s[1:]], axis=1)

    def em_table(self, n_steps: int, t_max: float = 1.0, t_min: float = 1e-3):
        """(n_steps, 5) rows (t, dlog_alpha_dt, beta, sigma, dt) for E-M SDE.

        The reference steps t from t_max down by dt = (t_max - t_min)/n_steps
        (/root/reference/mnist/compose_scores.py:27-46).
        """
        t_max = self._clamp_t_max(t_max)
        dt = (t_max - t_min) / n_steps
        ts = t_max - dt * jnp.arange(n_steps)
        return jnp.stack(
            [ts, self.dlog_alpha_dt(ts), self.beta(ts), self.sigma(ts),
             jnp.full((n_steps,), dt)], axis=1)

    def ode_table(self, n_steps: int, t_max: float = 1.0, t_min: float = 1e-3):
        """(n_steps, 5) rows (t, dlog_alpha_dt, g2, sigma, dt) for prob-flow ODE."""
        t_max = self._clamp_t_max(t_max)
        dt = (t_max - t_min) / n_steps
        ts = t_max - dt * jnp.arange(n_steps)
        return jnp.stack(
            [ts, self.dlog_alpha_dt(ts), self.g2(ts), self.sigma(ts),
             jnp.full((n_steps,), dt)], axis=1)


def _bcast(coef: Array, ndim: int) -> Array:
    """Broadcast a scalar or (B,) coefficient against an ndim-array."""
    coef = jnp.asarray(coef, jnp.float32)
    if coef.ndim == 0:
        return coef
    return coef.reshape(coef.shape + (1,) * (ndim - coef.ndim))


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Discrete DDPM schedule: beta linspace(1e-4, 0.02, T) and derived tables.

    Parity target: /root/reference/src/composing_colored_mnist.py:23-37 (VPSDE),
    src/composing_conditional_diffusion_on_shape_and_color.py:201-211 (Sampler),
    and the SDE-coefficient view of src/..._3.py:146-159 (DiffusionSDE).
    All tables are (T,) fp32 jnp arrays — XLA keeps them on device; per-step
    gathers inside scan are ``jnp.take``.
    """

    num_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "linear"      # linear (reference parity) | cosine
                                       # (Improved DDPM eq. 17, discrete,
                                       # beta clipped at 0.999 — beyond-ref)

    # Tables are derived lazily (jnp arrays are not hashable dataclass fields).
    @property
    def betas(self) -> Array:
        if self.beta_schedule == "cosine":
            # Improved DDPM (Nichol & Dhariwal 2021): abar from the shifted
            # cosine, beta_t = 1 - abar_t/abar_{t-1}, clipped at 0.999
            s = 0.008
            steps = jnp.arange(self.num_timesteps + 1, dtype=jnp.float32)
            f = jnp.cos((steps / self.num_timesteps + s) / (1 + s)
                        * jnp.pi / 2) ** 2
            abar = f / f[0]
            return jnp.clip(1.0 - abar[1:] / abar[:-1], 0.0, 0.999)
        if self.beta_schedule != "linear":
            raise ValueError(f"unknown beta_schedule {self.beta_schedule!r}; "
                             "choose 'linear' or 'cosine'")
        return jnp.linspace(self.beta_start, self.beta_end, self.num_timesteps,
                            dtype=jnp.float32)

    @property
    def alphas(self) -> Array:
        return 1.0 - self.betas

    @property
    def alphas_cumprod(self) -> Array:
        return jnp.cumprod(self.alphas)

    @property
    def alphas_cumprod_prev(self) -> Array:
        ac = self.alphas_cumprod
        return jnp.concatenate([jnp.ones((1,), ac.dtype), ac[:-1]])

    @property
    def sqrt_alphas_cumprod(self) -> Array:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> Array:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    @property
    def sqrt_recip_alphas(self) -> Array:
        return jax.lax.rsqrt(self.alphas)

    @property
    def posterior_variance(self) -> Array:
        return self.betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)

    # --- forward process ----------------------------------------------------
    def q_sample(self, key: Array, x0: Array, t: Array) -> Tuple[Array, Array]:
        """x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps for integer t. -> (x_t, eps)."""
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        a = _bcast(jnp.take(self.sqrt_alphas_cumprod, t), x0.ndim)
        s = _bcast(jnp.take(self.sqrt_one_minus_alphas_cumprod, t), x0.ndim)
        return a * x0 + s * eps, eps

    # --- SDE coefficient view (for the Ito density estimator) ---------------
    def sde_coeffs(self, t: Array) -> Tuple[Array, Array]:
        """(f_coeff, g2) at integer step t under the reference's convention:

        f(x, t) = -0.5 beta_t x,  g^2(t) = beta_t, with d_tau = 1/T.
        (/root/reference/src/diffusion/samplers.py:50-57.)
        """
        b = jnp.take(self.betas, t)
        return -0.5 * b, b

    def fd_sde_tables(self) -> Tuple[Array, Array]:
        """Finite-difference (f_coeff, g2) tables, (T,) each.

        Parity with get_forward_process_params
        (/root/reference/src/composing_conditional_diffusion_on_shape_and_color_6_1.py:296-327):
          f_coeff[t] = (log sqrt(abar_t) - log sqrt(abar_{t-1})) / dtau
          g2[t]      = max(2 sigma_t^2 (dlog sigma - dlog alpha), 1e-8)
        with abar_{-1} = 1 and the t=0 dlog-sigma term zeroed.
        """
        dtau = 1.0 / self.num_timesteps
        abar = self.alphas_cumprod
        log_a = 0.5 * jnp.log(abar)
        log_a_prev = jnp.concatenate([jnp.zeros((1,)), log_a[:-1]])
        dlog_a = (log_a - log_a_prev) / dtau
        sig2 = 1.0 - abar
        log_s = 0.5 * jnp.log(sig2)
        log_s_prev = jnp.concatenate([jnp.full((1,), -jnp.inf), log_s[:-1]])
        dlog_s = jnp.where(jnp.isfinite(log_s_prev),
                           (log_s - log_s_prev) / dtau, 0.0)
        g2 = jnp.maximum(2.0 * sig2 * (dlog_s - dlog_a), 1e-8)
        return dlog_a, g2

    def table(self) -> Array:
        """(T, 6) per-step rows consumed by scan bodies, index = timestep:
        (beta, sqrt_alpha, sqrt_recip_alpha, sqrt_1m_abar, posterior_var, sqrt_abar).
        """
        return jnp.stack([
            self.betas, jnp.sqrt(self.alphas), self.sqrt_recip_alphas,
            self.sqrt_one_minus_alphas_cumprod, self.posterior_variance,
            self.sqrt_alphas_cumprod,
        ], axis=1)
