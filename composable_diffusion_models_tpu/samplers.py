"""Samplers / reverse-time integrators (L2), all as ``jax.lax.scan`` bodies.

Design: every sampler takes a *prediction closure* and runs the ENTIRE
reverse trajectory inside one jitted scan — zero host sync per step, the
anti-pattern being replaced is the reference's per-step Python loop with K
sequential model forwards (e.g. /root/reference/mnist/compose_scores.py:29-46).
Composition is the caller's business: pass
``eps_fn = lambda x, t: compose.weighted(experts.apply(x, t), w)`` and the
whole K-expert blend fuses into the scan body.

Prediction closures:
  * ``eps_fn(x, t) -> eps_hat``            (already-composed prediction)
  * ``eps_stack_fn(x, t) -> (K, B, ...)``  (per-expert stack, for SUPERDIFF)
  * ``score_fn_i(x, t) -> sigma-scaled score``  (Ito-kappa family)

PRNG: a single key is carried through the scan and folded per step —
deterministic, reproducible, no host RNG.

Reference parity map (SURVEY.md §2.3): I1 euler_maruyama, I2 ddim,
I3 prob_flow_ode, I4 ddpm_ancestral, I5 superdiff / superdiff_and_solve,
I6 ito_kappa_ode, I7 layout, I8 cfg (closure helper), I9 sde_2d family.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import compose
from .ops.divergence import value_and_div
from .schedules import DDPMSchedule, VPSchedule

Array = jax.Array
EpsFn = Callable[[Array, Array], Array]


# ---------------------------------------------------------------------------
# I1 — Euler-Maruyama reverse SDE (continuous)
# ---------------------------------------------------------------------------
def euler_maruyama(eps_fn: EpsFn, schedule: VPSchedule, key: Array,
                   x_init: Array, n_steps: int, xi: float = 1.0,
                   t_max: float = 1.0, t_min: float = 1e-3) -> Array:
    """Reverse-time SDE, Euler-Maruyama, with churn parameter xi:

      score = -eps_hat / sigma(t)
      x    -= dt * [f - 0.5 (1 + xi) g^2 score] - sqrt(xi g^2 dt) N(0, 1)

    xi = 1 is the standard reverse SDE, xi = 0 the probability-flow ODE.

    NOTE — deliberate fix of a reference bug: the PyTorch E-M step
    (/root/reference/mnist/compose_scores.py:40-46, sample_image.py:24-43)
    uses ``dx = -(dlog_alpha x - beta/sigma eps)dt + sqrt(2 xi beta dt) N``,
    which moves AGAINST the score and diverges even with an exact Gaussian
    score model (verified numerically: std -> inf by step ~600 of 1000).
    The original JAX notebook the code was translated from is correct-signed
    (notebook/superposition_edu.py:122-126); we keep the notebook's behavior
    under every schedule kind.
    """
    table = schedule.ode_table(n_steps, t_max, t_min)  # (t, dloga, g2, sigma, dt)

    def body(carry, row):
        x, k = carry
        t, dloga, g2, sigma, dt = row[0], row[1], row[2], row[3], row[4]
        score = -eps_fn(x, t) / sigma
        drift = dloga * x - 0.5 * (1.0 + xi) * g2 * score
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x - drift * dt + jnp.sqrt(xi * g2 * dt) * noise
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x_init, key), table)
    return x


def euler_maruyama_traj(eps_fn: EpsFn, schedule: VPSchedule, key: Array,
                        x_init: Array, n_steps: int, xi: float = 1.0,
                        t_max: float = 1.0, t_min: float = 1e-3) -> Array:
    """As :func:`euler_maruyama` but returns the whole (n_steps+1, B, ...)
    trajectory (the reference's snapshot-history visualizations,
    mnist/visualize_composition_latent.py:72-73). Intended for low-dim
    latents; images at every step would be memory-heavy."""
    table = schedule.ode_table(n_steps, t_max, t_min)

    def body(carry, row):
        x, k = carry
        t, dloga, g2, sigma, dt = row[0], row[1], row[2], row[3], row[4]
        score = -eps_fn(x, t) / sigma
        drift = dloga * x - 0.5 * (1.0 + xi) * g2 * score
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x - drift * dt + jnp.sqrt(xi * g2 * dt) * noise
        return (x, k), x

    (_, _), traj = jax.lax.scan(body, (x_init, key), table)
    return jnp.concatenate([x_init[None], traj], axis=0)


# ---------------------------------------------------------------------------
# I2 — DDIM (deterministic, continuous-time parameterization)
# ---------------------------------------------------------------------------
def ddim(eps_fn: EpsFn, schedule: VPSchedule, x_init: Array, n_steps: int,
         clip: Optional[Tuple[float, float]] = (-1.0, 1.0),
         clip_min_alpha: float = 0.3,
         t_max: float = 1.0, t_min: float = 1e-3,
         eta: float = 0.0, key: Optional[Array] = None,
         predict: str = "eps", spacing: str = "linear",
         corrector_steps: int = 0, corrector_snr: float = 0.16,
         corrector_t_max: float = 1.0) -> Array:
    """DDIM update (parity: /root/reference/shapes/compose_images_ddim.py:21-70):

      x0_pred = (x - sigma_now * eps) / alpha_now, clamped
      x       = alpha_next * x0_pred + sigma_next * eps

    NOTE — alpha-gated clamping (deviation from the reference's unconditional
    clamp at compose_images_ddim.py:63): near t=1 alpha is ~1e-2, so the x0
    estimate is amplified prediction noise; clamping it there replaces x0 with
    a +-1 sign pattern, breaking the a_next/a_now cancellation that makes the
    un-clipped update stable — the trajectory blows up off-distribution and
    saturates (verified empirically on a trained MNIST expert: unconditional
    clamp -> all-white output; gate at alpha >= 0.3 -> clean samples at both
    50 and 200 steps). The clamp only applies once alpha_now >= clip_min_alpha.

    ``eta`` interpolates to the stochastic DDIM family (Song et al. 2020
    eq. 16, beyond-reference: the reference has only the deterministic form):
    per-step noise scale eta * (s_next / s_now) * sqrt(1 - (a_now / a_next)^2)
    with the eps coefficient shrunk to keep the marginal variance; eta=0 is
    the deterministic sampler (bit-identical to before), eta=1 matches DDPM
    ancestral noise levels. ``key`` is required when eta > 0.

    ``predict="x0"`` consumes a closure that returns the clean-image
    estimate directly instead of eps (the reference's cross-attention model,
    trained against target_rgb and used as x-hat-0 in its sampler —
    compositional_diffusion_with_cross_attention.py:259,301-313); eps is
    recovered as (x - alpha * x0) / sigma so the eta branch and the update
    are shared. ``predict="v"`` consumes a velocity model (Salimans & Ho
    2022): x0 = alpha*x - sigma*v and eps = sigma*x + alpha*v — identities
    valid only for the true-VP schedule (alpha^2 + sigma^2 = 1), enforced
    here. Train such models with make_loss_fn(..., predict=...).

    ``corrector_steps`` > 0 turns this into a predictor-corrector sampler
    (Song et al. 2021 alg. 4, beyond-reference): after each DDIM predictor
    update, that many annealed-Langevin (ULA) steps run at the new noise
    level,  x += e * score + sqrt(2 e) z,  with the signal-to-noise step
    size  e = 2 (r ||z|| / ||score||)^2  (r = ``corrector_snr``; batch-mean
    norms). MCMC at each level re-equilibrates the iterate toward the
    CURRENT composed density — the known fix for composed score fields that
    are not exact gradients (Du et al. 2023, "Reduce, Reuse, Recycle": plain
    reverse diffusion samples the wrong distribution for products of
    experts; Langevin corrections sample the intended one). ``key`` is
    required; the corrector composes with eta, predict, and spacing.
    ``corrector_t_max`` restricts correction to levels t <= threshold
    (measured: full-range correction on composed fields can destroy the
    early trajectory — the high-noise composed score is the least
    gradient-like; restricting MCMC to the low-noise tail keeps the fix
    where the density is well-shaped). The gated steps still evaluate
    eps_fn under the scan but apply a zero step size.
    """
    if predict not in ("eps", "x0", "v"):
        raise ValueError(f"predict must be 'eps', 'x0' or 'v', "
                         f"got {predict!r}")
    if predict == "v" and schedule.kind != "stable":
        raise ValueError("predict='v' needs VPSchedule(kind='stable')")
    # spacing="karras" places steps uniformly in sigma^(1/7) (EDM eq. 5,
    # beyond-reference) — the table AND the model-input ts share the grid
    grid = schedule.ddim_grid(n_steps, t_max, t_min, spacing)
    table = schedule.ddim_table(n_steps, t_max, t_min, spacing)
    # t values at the "now" edge of each interval, for the model input
    ts = grid[:-1]
    if eta > 0.0 and key is None:
        raise ValueError("stochastic DDIM (eta > 0) needs a PRNG key")
    if corrector_steps > 0 and key is None:
        raise ValueError("the Langevin corrector needs a PRNG key")

    def to_eps(out, x, a, s):
        if predict == "x0":
            return (x - a * out) / jnp.maximum(s, 1e-12)
        if predict == "v":
            return s * x + a * out
        return out

    def langevin(x, t_next, a_next, s_next, i):
        # ULA at the post-predictor noise level; snr-scaled step size
        # (Song et al. 2021 alg. 4 with alpha ~ 1). Unrolled: small static k.
        red = tuple(range(1, x.ndim))
        for j in range(corrector_steps):
            eps_hat = to_eps(eps_fn(x, t_next), x, a_next, s_next)
            score = -eps_hat / jnp.maximum(s_next, 1e-12)
            z = jax.random.normal(
                jax.random.fold_in(key, n_steps + 1 + i * corrector_steps + j),
                x.shape, x.dtype)
            g_norm = jnp.mean(jnp.sqrt(jnp.sum(score**2, axis=red)))
            z_norm = jnp.mean(jnp.sqrt(jnp.sum(z**2, axis=red)))
            e = 2.0 * (corrector_snr * z_norm / jnp.maximum(g_norm, 1e-20))**2
            # t-gate under jit: zero step size == identity update
            e = e * (t_next <= corrector_t_max)
            x = x + e * score + jnp.sqrt(2.0 * e) * z
        return x

    def body(x, row_t):
        row, t, t_nxt, i = row_t
        a_now, s_now, a_next, s_next = row[0], row[1], row[2], row[3]
        out = eps_fn(x, t)
        if predict == "x0":
            x0 = out
        elif predict == "v":
            x0 = a_now * x - s_now * out
        else:
            x0 = (x - s_now * out) / a_now
        if clip is not None:
            x0 = jnp.where(a_now >= clip_min_alpha,
                           jnp.clip(x0, clip[0], clip[1]), x0)
        # eps mode keeps the RAW model eps in the update (reference
        # behavior); x0/v modes derive eps from the (possibly clipped) x0 so
        # the update stays self-consistent with the estimate it renoises
        eps_hat = (out if predict == "eps"
                   else (x - a_now * x0) / jnp.maximum(s_now, 1e-12))
        if eta > 0.0:
            sig = eta * (s_next / jnp.maximum(s_now, 1e-12)) * jnp.sqrt(
                jnp.clip(1.0 - (a_now / a_next) ** 2, 0.0))
            eps_coef = jnp.sqrt(jnp.clip(s_next**2 - sig**2, 0.0))
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape,
                                      x.dtype)
            x_new = a_next * x0 + eps_coef * eps_hat + sig * noise
        else:
            x_new = a_next * x0 + s_next * eps_hat
        if corrector_steps > 0:
            x_new = langevin(x_new, t_nxt, a_next, s_next, i)
        return x_new, None

    x, _ = jax.lax.scan(body, x_init,
                        (table, ts, grid[1:], jnp.arange(n_steps)))
    return x


def dpm_solver_pp_2m(eps_fn: EpsFn, schedule: VPSchedule, x_init: Array,
                     n_steps: int,
                     clip: Optional[Tuple[float, float]] = (-1.0, 1.0),
                     clip_min_alpha: float = 0.3,
                     t_max: float = 1.0, t_min: float = 1e-3,
                     spacing: str = "logsnr") -> Array:
    """DPM-Solver++(2M): second-order multistep ODE solver in the
    half-log-SNR parameterization (Lu et al. 2022, arXiv:2211.01095, Alg. 2,
    data-prediction form) — a capability beyond the reference (its fastest
    deterministic sampler is first-order DDIM): ~2x fewer model evaluations
    at matched sample quality (tests/test_samplers.py verifies faster
    convergence than DDIM on the analytic Gaussian case).

      lambda = log(alpha/sigma);  h_i = lambda_i - lambda_{i-1}
      D_i    = (1 + 1/(2 r)) x0_pred_i - 1/(2 r) x0_pred_{i-1},  r = h_{i-1}/h_i
      x_i    = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i (exp(-h_i) - 1) D_i

    First step falls back to the one-step (DDIM-equivalent) update. x0
    clamping is alpha-gated exactly as in :func:`ddim`. ``spacing`` follows
    the paper: "logsnr" places steps uniformly in lambda (so r == 1 and the
    2M combination is the classic AB2 — markedly better at few steps);
    "time" reuses the reference's uniform-t DDIM grid.
    """
    if spacing == "logsnr":
        dense = jnp.linspace(t_max, t_min, 4096)
        lam_dense = jnp.log(schedule.alpha(dense)) - jnp.log(
            schedule.sigma(dense))
        lam_targets = jnp.linspace(lam_dense[0], lam_dense[-1], n_steps + 1)
        ts = jnp.interp(lam_targets, lam_dense, dense)
    else:
        ts = jnp.linspace(t_max, t_min, n_steps + 1)
    a, s = schedule.alpha(ts), schedule.sigma(ts)
    lam = jnp.log(a) - jnp.log(s)
    # rows: (a_now, s_now, a_next, s_next, h_next, h_prev, t_now)
    h = lam[1:] - lam[:-1]
    h_prev = jnp.concatenate([jnp.zeros((1,)), h[:-1]])
    table = jnp.stack([a[:-1], s[:-1], a[1:], s[1:], h, h_prev, ts[:-1]],
                      axis=1)

    def x0_pred(x, a_now, s_now, t):
        x0 = (x - s_now * eps_fn(x, t)) / a_now
        if clip is not None:
            x0 = jnp.where(a_now >= clip_min_alpha,
                           jnp.clip(x0, clip[0], clip[1]), x0)
        return x0

    def body(carry, row):
        x, d_prev, have_prev = carry
        a_now, s_now, a_next, s_next = row[0], row[1], row[2], row[3]
        h_next, h_last, t = row[4], row[5], row[6]
        d = x0_pred(x, a_now, s_now, t)
        r = h_last / h_next
        d2 = jnp.where(have_prev,
                       (1.0 + 1.0 / (2.0 * r)) * d - (1.0 / (2.0 * r)) * d_prev,
                       d)
        x = (s_next / s_now) * x - a_next * jnp.expm1(-h_next) * d2
        return (x, d, jnp.ones((), bool)), None

    init = (x_init, jnp.zeros_like(x_init), jnp.zeros((), bool))
    (x, _, _), _ = jax.lax.scan(body, init, table)
    return x


# ---------------------------------------------------------------------------
# I3 — Probability-flow ODE (Euler)
# ---------------------------------------------------------------------------
def prob_flow_ode(score_fn: EpsFn, schedule: VPSchedule, x_init: Array,
                  n_steps: int, t_max: float = 1.0,
                  t_min: float = 1e-3) -> Array:
    """dx/dt = dlog_alpha/dt * x - 0.5 g^2 * score; Euler, reverse time.

    ``score_fn`` returns the TRUE score (not sigma-scaled): callers adapt
    eps models via score = -eps_hat / sigma. Parity:
    /root/reference/shapes/compose_images_ito_2.py:139-150.
    """
    table = schedule.ode_table(n_steps, t_max, t_min)

    def body(x, row):
        t, dloga, g2, _, dt = row[0], row[1], row[2], row[3], row[4]
        s = score_fn(x, t)
        dxdt = dloga * x - 0.5 * g2 * s
        return x - dxdt * dt, None

    x, _ = jax.lax.scan(body, x_init, table)
    return x


# ---------------------------------------------------------------------------
# I4 — DDPM ancestral sampling (discrete)
# ---------------------------------------------------------------------------
def ddpm_ancestral(eps_fn: EpsFn, sde: DDPMSchedule, key: Array,
                   x_init: Array,
                   clip: Optional[Tuple[float, float]] = (-1.0, 1.0),
                   noise_scale: float = 1.0) -> Array:
    """Ancestral DDPM in the score form of the canonical SuperDiff class
    (/root/reference/src/diffusion/samplers.py:61-81):

      score = -eps / sqrt(1 - abar_t)
      mean  = 1/sqrt(alpha_t) * (x + beta_t * score)
      x     = mean + sqrt(posterior_var) * N   (no noise at the last step)
    """
    tbl = sde.table()
    n = sde.num_timesteps
    t_idx = jnp.arange(n - 1, -1, -1)

    def body(carry, ti):
        x, k = carry
        row = tbl[ti]
        beta, sqrt_a, s1m = row[0], row[1], row[3]
        eps_hat = eps_fn(x, ti)
        score = -eps_hat / s1m
        mean = (x + beta * score) / sqrt_a
        k, sub = jax.random.split(k)
        noise = noise_scale * jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(ti > 0, mean + jnp.sqrt(row[4]) * noise, mean)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x_init, key), t_idx)
    if clip is not None:
        x = jnp.clip(x, clip[0], clip[1])
    return x


# ---------------------------------------------------------------------------
# I5 — SUPERDIFF with the Ito density estimator (OR / AND heuristic / fixed)
# ---------------------------------------------------------------------------
def superdiff(eps_stack_fn: Callable[[Array, Array], Array], sde: DDPMSchedule,
              key: Array, x_init: Array, operation: str = "OR",
              temp: float = 1.0, bias=0.0,
              clip: Optional[Tuple[float, float]] = (-1.0, 1.0),
              noise_scale: float = 1.0,
              kappa_fixed: Optional[Sequence[float]] = None) -> Array:
    """Density-tracked composition (parity:
    /root/reference/src/diffusion/samplers.py:12-59).

    Carry: (x, log_q[K, B], key). Per step:
      scores_i = -eps_i / sqrt(1-abar_t)
      kappa    = softmax(T*log_q + bias)      (OR)
                 softmax(-log_q)              (AND heuristic)
                 1/K                          (otherwise)
      ancestral step with combined score, then per-expert
      d log_q = <dx, s> + (div f + <f - 0.5 g^2 s, s>) dtau
      with f = -0.5 beta_t x, g^2 = beta_t, div f = -0.5 beta_t d, dtau = 1/T.

    ``bias`` tilts the OR blend only when per-expert (shape (K,)); a
    non-zero scalar raises in compose.or_softmax (shift-invariant no-op).
    """
    tbl = sde.table()
    n = sde.num_timesteps
    t_idx = jnp.arange(n - 1, -1, -1)
    op = operation.upper()
    if op == "FIXED" and kappa_fixed is None:
        raise ValueError("operation='FIXED' requires kappa_fixed=[w_1..w_K]")
    dtau = 1.0 / n
    d = float(math.prod(x_init.shape[1:]))
    axes_fn = lambda a: tuple(range(1, a.ndim))

    def body(carry, ti):
        x, log_q, k = carry
        row = tbl[ti]
        beta, sqrt_a, s1m, pvar = row[0], row[1], row[3], row[4]
        eps_stack = eps_stack_fn(x, ti)            # (K, B, ...)
        scores = -eps_stack / s1m
        if op == "OR":
            kappa = compose.or_softmax(log_q, temp, bias)
        elif op == "AND":
            kappa = compose.and_heuristic(log_q)
        elif op == "FIXED":
            # fixed-kappa ablation (reference _6_3.py:368-371)
            kw = jnp.asarray(kappa_fixed, log_q.dtype)
            kappa = jnp.broadcast_to(kw[:, None], log_q.shape)
        else:
            kappa = jnp.full_like(log_q, 1.0 / log_q.shape[0])
        kb = kappa.reshape(kappa.shape + (1,) * (x.ndim - 1))
        combined = jnp.sum(kb * scores, axis=0)
        mean = (x + beta * combined) / sqrt_a
        k, sub = jax.random.split(k)
        noise = noise_scale * jax.random.normal(sub, x.shape, x.dtype)
        x_prev = jnp.where(ti > 0, mean + jnp.sqrt(pvar) * noise, mean)
        dx = x_prev - x
        div_f = -0.5 * beta * d
        f = -0.5 * beta * x

        def dlogq(s):
            term1 = jnp.sum(dx * s, axis=axes_fn(s))
            inner = jnp.sum((f - 0.5 * beta * s) * s, axis=axes_fn(s))
            return term1 + (div_f + inner) * dtau

        log_q = log_q + jax.vmap(dlogq)(scores)
        return (x_prev, log_q, k), None

    log_q0 = jnp.zeros((_num_experts(eps_stack_fn, x_init), x_init.shape[0]),
                       x_init.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x_init, log_q0, key), t_idx)
    if clip is not None:
        x = jnp.clip(x, clip[0], clip[1])
    return x


def _num_experts(eps_stack_fn, x_init) -> int:
    """Static expert count via abstract evaluation (no FLOPs)."""
    shape = jax.eval_shape(eps_stack_fn, x_init,
                           jnp.zeros((), jnp.int32)).shape
    return shape[0]


# ---------------------------------------------------------------------------
# I5b — SUPERDIFF rigorous AND (Prop.-6 2x2 linear system), K = 2
# ---------------------------------------------------------------------------
def superdiff_and_solve(eps_stack_fn: Callable[[Array, Array], Array],
                        sde: DDPMSchedule, key: Array, x_init: Array,
                        mode: str = "AND", temp: float = 1.0,
                        bias=0.0,
                        k_experts: Optional[int] = None) -> Array:
    """Parity: sample_superdiff at
    /root/reference/src/composing_conditional_diffusion_on_shape_and_color_6_1.py:330-429.

    Uses finite-difference (f_coeff, g2) tables; AND builds the KxK system
    from drift/score inner products (compose.and_solve_k; the reference is
    hardcoded to 2 experts — K>2 is a beyond-reference capability).

    ``bias``: in AND mode a scalar meaningfully tilts every density-change
    row of the linear system; per-expert shape (K,) tilts expert targets
    (compose._row_bias). In OR mode only per-expert (K,) has effect — a
    non-zero scalar raises (compose.or_softmax).
    """
    if k_experts is None:
        k_experts = _num_experts(eps_stack_fn, x_init)
    tbl = sde.table()
    f_coeffs, g2s = sde.fd_sde_tables()
    n = sde.num_timesteps
    t_idx = jnp.arange(n - 1, -1, -1)
    dtau = 1.0 / n
    d = float(math.prod(x_init.shape[1:]))
    up = mode.upper()

    def body(carry, ti):
        x, log_q, k = carry
        row = tbl[ti]
        beta, _, recip_sa, s1m, pvar = row[0], row[1], row[2], row[3], row[4]
        f_c, g2 = f_coeffs[ti], g2s[ti]
        eps_stack = eps_stack_fn(x, ti)            # (K, B, ...)
        scores = -eps_stack / s1m
        f = f_c * x
        axes = tuple(range(2, eps_stack.ndim))     # feature axes of the stack

        if up == "OR":
            kappa = compose.or_softmax(log_q, temp, bias)   # (K, B)
        else:
            k, ksub = jax.random.split(k)
            dW = jax.random.normal(ksub, x.shape, x.dtype) * jnp.sqrt(dtau)
            rev_drift = -f[None] + 0.5 * g2 * scores        # (K, B, ...)
            # a[b, r, c] = dtau * <rev_drift_c, score_r>
            a = dtau * jnp.einsum("cb...,rb...->brc",
                                  rev_drift.reshape(k_experts, x.shape[0], -1),
                                  scores.reshape(k_experts, x.shape[0], -1))
            div_f = f_c * d
            det_part = dtau * (div_f + jnp.sum(
                (f[None] - 0.5 * g2 * scores) * scores, axis=axes))
            sto_part = jnp.sum(jnp.sqrt(g2) * dW[None] * scores, axis=axes)
            b = (det_part + sto_part).T                     # (B, K)
            kappa = compose.and_solve_k(a, b, bias).T        # (K, B)

        kb = kappa.reshape(kappa.shape + (1,) * (x.ndim - 1))
        composed_score = jnp.sum(kb * scores, axis=0)
        composed_noise = -composed_score * s1m
        mean = recip_sa * (x - beta * composed_noise / s1m)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x_prev = jnp.where(ti > 0, mean + jnp.sqrt(pvar) * noise, mean)

        dx = x_prev - x
        div_f = f_c * d

        def dlogq(s):
            term1 = jnp.sum(dx * s, axis=tuple(range(1, s.ndim)))
            inner = jnp.sum((f - 0.5 * g2 * s) * s,
                            axis=tuple(range(1, s.ndim)))
            return term1 + dtau * (div_f + inner)

        log_q = log_q + jax.vmap(dlogq)(scores)
        return (x_prev, log_q, k), None

    log_q0 = jnp.zeros((k_experts, x_init.shape[0]), x_init.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x_init, log_q0, key), t_idx)
    return x


# ---------------------------------------------------------------------------
# I6 — Ito-kappa composed prob-flow ODE (divergence-based AND, continuous)
# ---------------------------------------------------------------------------
def ito_kappa_ode(score_fns: Tuple[EpsFn, EpsFn], schedule: VPSchedule,
                  key: Array, x_init: Array, n_steps: int,
                  probe: str = "rademacher",
                  clip_kappa: Optional[Tuple[float, float]] = None,
                  t_max: float = 1.0, t_min: float = 1e-3) -> Array:
    """Two-expert equal-density composition via Hutchinson divergence.

    ``score_fns`` return sigma-scaled scores s = sigma * dlog q/dx (the JAX
    notebook's net convention). Per step (parity:
    /root/reference/notebook/superposition_edu.py:191-227, torch image-space
    twin shapes/compose_images_ito_2.py:100-152):

      (s_i, div_i) = jvp-divergence of score_fn_i at x
      kappa  = [sigma (div1 - div2) + <s1, s1 - s2>] / ||s1 - s2||^2
      s      = s2 + kappa (s1 - s2)
      dx/dt  = dlog_alpha/dt * x - 0.5 g^2 (s / sigma);  x -= dt * dx/dt

    (0.5 g^2 / sigma == the notebook's beta(t) under the corrected g2 — see
    VPSchedule.g2 — so this is both the notebook's update and the true
    probability-flow ODE, valid for every schedule kind.)
    """
    dt = (t_max - t_min) / n_steps
    ts = t_max - dt * jnp.arange(n_steps)

    def body(carry, t):
        x, k = carry
        k, k1, k2 = jax.random.split(k, 3)
        s1, div1 = value_and_div(lambda v: score_fns[0](v, t), x, k1, probe)
        s2, div2 = value_and_div(lambda v: score_fns[1](v, t), x, k2, probe)
        sigma_t = schedule.sigma(t)
        kappa = compose.kappa_ito(sigma_t, (div1, div2), (s1, s2), clip_kappa)
        s = compose.combine_kappa(kappa, s1, s2)
        dxdt = (schedule.dlog_alpha_dt(t) * x
                - 0.5 * schedule.g2(t) * s / sigma_t)
        return (x - dt * dxdt, k), None

    (x, _), _ = jax.lax.scan(body, (x_init, key), ts)
    return x


def superposition_2d(score_fns: Tuple[EpsFn, EpsFn], schedule: VPSchedule,
                     key: Array, x_init: Array, n_steps: int,
                     probe: str = "rademacher") -> Tuple[Array, Array]:
    """Notebook-parity 2D superposition with log-likelihood tracking.

    Returns (x_final, ll) where ll is (K=2, B) integrated d log-likelihood
    (parity: get_dll / composed loop, notebook/superposition_edu.py:191-227).
    """
    dt = 1.0 / n_steps
    ts = 1.0 - dt * jnp.arange(n_steps)
    ndim = x_init.shape[-1]

    def body(carry, t):
        x, ll, k = carry
        k, kp = jax.random.split(k)
        # the notebook reuses ONE probe key for both experts per step
        s1, div1 = value_and_div(lambda v: score_fns[0](v, t), x, kp, probe)
        s2, div2 = value_and_div(lambda v: score_fns[1](v, t), x, kp, probe)
        sigma_t = schedule.sigma(t)
        kappa = compose.kappa_ito(sigma_t, (div1, div2), (s1, s2))
        s = compose.combine_kappa(kappa, s1, s2)
        dloga, beta = schedule.dlog_alpha_dt(t), schedule.beta(t)
        dxdt = dloga * x - beta * s

        def dll(si, divi):
            v = dloga * x - beta * si
            out = -dloga * ndim + beta * divi
            out = out - jnp.sum((si / sigma_t) * (v - dxdt), axis=-1)
            return out

        ll = ll - dt * jnp.stack([dll(s1, div1), dll(s2, div2)])
        return (x - dt * dxdt, ll, k), None

    ll0 = jnp.zeros((2, x_init.shape[0]), x_init.dtype)
    (x, ll, _), _ = jax.lax.scan(body, (x_init, ll0, key), ts)
    return x, ll


# ---------------------------------------------------------------------------
# I7 — LayoutDiff spatial-mask sampler (discrete)
# ---------------------------------------------------------------------------
def layout(eps_stack_fn: Callable[[Array, Array], Array], sde: DDPMSchedule,
           key: Array, x_init: Array, masks: Array,
           clip: Optional[Tuple[float, float]] = (-1.0, 1.0)) -> Array:
    """Masked score composition + DDPM posterior step (parity:
    /root/reference/src/composing_colored_digit_to_simulate_overlaying.py:56-124).

    ``masks``: (K, H, W), possibly overlapping; occlusion is resolved once
    up-front (last mask on top), then each step does one fused multiply-add.
    """
    final_masks = compose.resolve_occlusion(masks)
    tbl = sde.table()
    abar = sde.alphas_cumprod
    abar_prev = sde.alphas_cumprod_prev
    alphas = sde.alphas
    n = sde.num_timesteps
    t_idx = jnp.arange(n - 1, -1, -1)

    def body(carry, ti):
        x, k = carry
        row = tbl[ti]
        beta, s1m, pvar, sqrt_abar = row[0], row[3], row[4], row[5]
        eps_stack = eps_stack_fn(x, ti)
        combined = compose.masked(eps_stack, final_masks)
        x0 = jnp.clip((x - s1m * combined) / sqrt_abar, -1.0, 1.0)
        ab, abp, a = abar[ti], abar_prev[ti], alphas[ti]
        mean = (jnp.sqrt(abp) * beta / (1.0 - ab)) * x0 + \
               (jnp.sqrt(a) * (1.0 - abp) / (1.0 - ab)) * x
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(ti > 0, mean + jnp.sqrt(pvar) * noise, mean)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x_init, key), t_idx)
    if clip is not None:
        x = jnp.clip(x, clip[0], clip[1])
    return x


# ---------------------------------------------------------------------------
# I8 — CFG prediction closures (condition fan-out in ONE batched forward)
# ---------------------------------------------------------------------------
def make_cfg_eps_fn(apply_fn: Callable[..., Array],
                    cond_labels: Sequence[Tuple[Array, ...]],
                    null_labels: Tuple[Array, ...],
                    weights: Array) -> EpsFn:
    """Build eps_fn(x, t) = cfg-composed prediction from ONE model.

    All conditions plus the uncond slot run as a single forward with the
    condition fan-out folded into the batch axis — the layout the reference
    itself calls "highly efficient"
    (/root/reference/src/compositional_diffusion_with_cross_attention.py:282-292).

    ``cond_labels``: list of K label tuples (each tuple = one per label slot,
    each of shape (B,)); ``null_labels``: the uncond tuple.
    """
    k = len(cond_labels)
    weights = jnp.asarray(weights)

    def eps_fn(x: Array, t: Array) -> Array:
        b = x.shape[0]
        x_rep = jnp.concatenate([x] * (k + 1), axis=0)
        t_rep = jnp.concatenate([jnp.broadcast_to(t, (b,))] * (k + 1), axis=0)
        labels = []
        n_slots = len(null_labels)
        for slot in range(n_slots):
            slot_vals = [null_labels[slot]] + [c[slot] for c in cond_labels]
            labels.append(jnp.concatenate(
                [jnp.broadcast_to(v, (b,)) for v in slot_vals], axis=0))
        out = apply_fn(x_rep, t_rep, *labels)
        out = out.reshape(k + 1, b, *out.shape[1:])
        return compose.cfg(out[0], out[1:], weights)

    return eps_fn


def make_classifier_guided_eps_fn(eps_fn: EpsFn, schedule: VPSchedule,
                                  logp_fn: Callable[[Array, Array], Array],
                                  scale: float = 1.0) -> EpsFn:
    """Classifier guidance (Dhariwal & Nichol 2021) — a beyond-reference
    composition lever: steer ANY unconditional/composed eps closure with the
    gradient of an external classifier, no retraining of the experts.

        eps'(x, t) = eps(x, t) - scale * sigma(t) * grad_x log p(y | x_t)

    (in score units: s' = s + scale * grad log p(y|x) — at scale 1 this is
    exactly Bayes' rule, sampling the class-conditional p(x|y); verified
    analytically in test_samplers.py on a 2-Gaussian mixture whose guided
    sampler must land on the class-1 component).

    ``logp_fn(x, t) -> (B,)``: log-probability of the TARGET class under a
    noise-aware classifier (e.g. eval.ProbeClassifier trained with
    ``noise_aug``; slice its logits at the target and log-softmax). The
    gradient flows through jax.grad inside the jitted sampler scan — no
    autograd-graph juggling as in the torch equivalent.

    ``scale`` may be a callable ``scale(t) -> scalar`` for t-scheduled
    guidance (e.g. guide only the low-noise tail: guidance needs are
    t-dependent — the probe's gradients are most informative once structure
    exists, while early steps should follow the composed prior).
    """
    def guided(x: Array, t: Array) -> Array:
        eps = eps_fn(x, t)
        g = jax.grad(lambda xx: jnp.sum(logp_fn(xx, t)))(x)
        sig = jnp.asarray(schedule.sigma(t))
        if sig.ndim:  # per-sample t: broadcast over trailing dims
            sig = sig.reshape(sig.shape + (1,) * (x.ndim - sig.ndim))
        s = scale(t) if callable(scale) else scale
        return eps - s * sig * g

    return guided


# ---------------------------------------------------------------------------
# Parallel-in-time sampling (beyond-reference; Shih et al. 2023,
# "Parallel Sampling of Diffusion Models", arXiv:2305.16317)
# ---------------------------------------------------------------------------
def parallel_prob_flow(score_fn: EpsFn, schedule: VPSchedule, x_init: Array,
                       n_steps: int, n_iters: int = 12,
                       t_max: float = 1.0,
                       t_min: float = 1e-3) -> Tuple[Array, Array]:
    """Probability-flow ODE solved by Picard fixed-point iteration IN TIME.

    The sequential Euler solve x[j+1] = x[j] - dxdt(x[j], t_j) dt is the
    fixed point of

        X[j] = x_init - sum_{i<j} dxdt(X[i], t_i) dt .

    Each Picard sweep evaluates the score at ALL n_steps trajectory points in
    ONE batched forward (time folded into the batch axis) and integrates with
    a prefix sum — a (B*n_steps)-sized MXU-saturating program whose
    sequential depth is ``n_iters`` instead of ``n_steps``. This is the
    TPU-natural latency/FLOPs trade for small batches (Shih et al. 2023):
    convergence needs far fewer sweeps than steps, so wall-clock drops
    whenever the chip has idle FLOPs at the sequential batch size. Same
    ``score_fn`` convention as :func:`prob_flow_ode` (TRUE score; eps models
    adapt via -eps/sigma).

    Returns (x_final, residuals): residuals[k] = max |trajectory update| of
    sweep k — monotone decrease certifies contraction; compare the tail
    against the sweep budget to pick ``n_iters``.
    """
    table = schedule.ode_table(n_steps, t_max, t_min)  # (t, dloga, g2, ., dt)
    ts, dloga, g2, dt = table[:, 0], table[:, 1], table[:, 2], table[:, 4]
    b = x_init.shape[0]
    feat_shape = x_init.shape[1:]
    nf = len(feat_shape)

    def col(v):  # (n,) -> (n, 1, 1...) broadcast against (n, B, ...)
        return v.reshape((-1,) + (1,) * (1 + nf))

    def sweep(traj):
        # traj: (n_steps, B, ...) current guess at each grid point
        flat_x = traj.reshape((n_steps * b,) + feat_shape)
        flat_t = jnp.repeat(ts, b)
        s = score_fn(flat_x, flat_t).reshape((n_steps, b) + feat_shape)
        dxdt = col(dloga) * traj - 0.5 * col(g2) * s
        steps = dxdt * col(dt)
        # X[j] = x_init - (exclusive prefix sum of steps)
        csum = jnp.cumsum(steps, axis=0)
        new = jnp.concatenate([x_init[None], x_init[None] - csum[:-1]],
                              axis=0)
        return new, x_init - csum[-1]

    def body(carry, _):
        traj, _ = carry
        new, x_fin = sweep(traj)
        resid = jnp.max(jnp.abs(new - traj))
        return (new, x_fin), resid

    traj0 = jnp.broadcast_to(x_init, (n_steps,) + x_init.shape)
    (_, x_final), residuals = jax.lax.scan(
        body, (traj0, x_init), None, length=n_iters)
    return x_final, residuals


# ---------------------------------------------------------------------------
# Beyond-reference: exact log-likelihood via the probability-flow ODE
# ---------------------------------------------------------------------------
def log_likelihood(score_fn: EpsFn, schedule: VPSchedule, x_data: Array,
                   n_steps: int, key: Optional[Array] = None,
                   probe: str = "rademacher", n_probes: int = 1,
                   exact: bool = False, t_min: float = 1e-3,
                   t_max: float = 1.0) -> Tuple[Array, Array]:
    """Per-example log p(x) in nats under a score model (+ terminal latent).

    Integrates the probability-flow ODE FORWARD in time (data -> noise) with
    the instantaneous change-of-variables formula (FFJORD / Song et al. 2021
    eq. 33): for dx/dt = f(x, t),  d log p(x(t))/dt = -div f,  so

        log p(x) = log N(x(t_max); 0, v I) + int_{t_min}^{t_max} div f dt,

    with the terminal prior variance v = alpha(t_max)^2 + sigma(t_max)^2
    (exact for unit-variance data; =1 for the stable VP schedule where
    alpha(1) ~ 6.6e-3). This generalizes the reference's per-expert running
    d log q inside the SUPERDIFF sampler (src/diffusion/samplers.py:50-57) —
    which only ever produces *relative* densities along a reverse trajectory —
    into a standalone evaluator of data likelihood, a capability the
    reference does not have (it publishes no NLL/bits-per-dim numbers).

    Divergence: Hutchinson jvp probes (``probe``/``n_probes``; key required)
    or the exact Jacobian trace with ``exact=True`` (tiny dims only — cost is
    D forwards per step). ``score_fn`` returns the TRUE score (adapt eps
    models via score = -eps_hat / sigma, same convention as prob_flow_ode).
    The whole trajectory is one ``lax.scan``: jit-safe, zero host sync.
    """
    if not exact and key is None:
        raise ValueError("log_likelihood needs a PRNG key unless exact=True")
    dt = (t_max - t_min) / n_steps
    ts = t_min + dt * jnp.arange(n_steps)  # ascending: data -> noise
    table = jnp.stack(
        [ts, schedule.dlog_alpha_dt(ts), schedule.g2(ts)], axis=1)
    axes = tuple(range(1, x_data.ndim))
    dim = math.prod(x_data.shape[1:])
    carry_key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, row):
        x, delta, k = carry
        t, dloga, g2 = row[0], row[1], row[2]

        def f(xx):
            return dloga * xx - 0.5 * g2 * score_fn(xx, t)

        if exact:
            flat = x.reshape(x.shape[0], -1)

            def f_flat(xf):
                return f(xf.reshape(x.shape)).reshape(x.shape[0], -1)

            fx_flat, div = _exact_div(f_flat, flat)
            fx = fx_flat.reshape(x.shape)
        else:
            k = jax.random.fold_in(k, 0)
            fx, div = value_and_div(f, x, k, probe=probe, n_probes=n_probes)
        return (x + fx * dt, delta + div * dt, k), None

    zero = jnp.zeros((x_data.shape[0],), jnp.float32)
    (x_T, delta, _), _ = jax.lax.scan(
        body, (x_data, zero, carry_key), table)
    prior_var = (schedule.alpha(jnp.asarray(t_max)) ** 2
                 + schedule.sigma(jnp.asarray(t_max)) ** 2)
    log_prior = (-0.5 * jnp.sum(x_T * x_T, axis=axes) / prior_var
                 - 0.5 * dim * jnp.log(2.0 * math.pi * prior_var))
    return log_prior + delta, x_T


def _exact_div(f_flat, flat):
    """Exact divergence of a flat (B, D) -> (B, D) map — scan-body safe."""
    d = flat.shape[1]

    def one_dim(i):
        e = jnp.zeros_like(flat).at[:, i].set(1.0)
        _, jvp_val = jax.jvp(f_flat, (flat,), (e,))
        return jvp_val[:, i]

    traces = jax.vmap(one_dim)(jnp.arange(d))  # (D, B)
    return f_flat(flat), jnp.sum(traces, axis=0)


def bits_per_dim(log_p: Array, data_shape: Sequence[int],
                 nbins: int = 256) -> Array:
    """Convert log p(x) in nats (data scaled to [-1, 1]) to bits/dim.

    Standard uniform-dequantization convention: discrete pixels v in
    {0..nbins-1} map to x = (v + u)/ (nbins/2) - 1, bin width 2/nbins, so
    log2 P(v) = log2 p(x) - D log2(nbins/2) and
    bpd = -log2 P(v)/D = -log_p/(D ln 2) + log2(nbins/2).
    """
    dim = math.prod(data_shape)
    return -log_p / (dim * math.log(2.0)) + math.log2(nbins / 2.0)
