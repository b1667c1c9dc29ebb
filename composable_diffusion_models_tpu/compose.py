"""Composition operators (L3): the framework's raison d'etre.

Each operator is a pure function over a stacked per-expert prediction
``eps_stack`` / ``score_stack`` of shape (K, B, ...) plus whatever auxiliary
state it needs (running log-densities, divergences). They are trivially
fusable jnp ops designed to live INSIDE a sampler's ``lax.scan`` body.

Reference parity (SURVEY.md §1-L3):
  1. weighted          mnist/compose_scores.py:37
  2. kappa_ito         notebook/superposition_edu.py:198-204 (get_kappa);
                       shapes/compose_images_ito_2.py:72-97
  3. or_softmax        src/diffusion/samplers.py:25-28
     and_heuristic     src/diffusion/samplers.py:29-33
  4. and_solve         src/..._6_1.py:369-401 (Prop.-6 2x2 linear system)
  5. cfg               src/..._5.py:313-325; cross_attention:290-299
  6. masked / resolve_occlusion
                       src/composing_colored_digit_to_simulate_overlaying.py:69-95
  7. fixed kappa       shapes/visualize_composition_latent_avg.py:89-99
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _kexp(w: Array, ref: Array) -> Array:
    """Broadcast per-expert (K,) or (K, B) weights against (K, B, ...) stack."""
    w = jnp.asarray(w, ref.dtype)
    return w.reshape(w.shape + (1,) * (ref.ndim - w.ndim))


# 1. ---------------------------------------------------------------------
def weighted(eps_stack: Array, weights: Array) -> Array:
    """eps = sum_i w_i eps_i / sum_i w_i  over the leading expert axis."""
    w = _kexp(weights, eps_stack)
    return jnp.sum(w * eps_stack, axis=0) / jnp.sum(w, axis=0)


# 2. ---------------------------------------------------------------------
def kappa_ito(sigma_t: Array, divs: Tuple[Array, Array],
              scores: Tuple[Array, Array],
              clip: Optional[Tuple[float, float]] = None) -> Array:
    """Equal-density-path kappa for two experts (pointwise AND).

    kappa = [sigma_t (div s1 - div s2) + <s1, s1 - s2>] / ||s1 - s2||^2
    combined score = s2 + kappa (s1 - s2).

    ``scores`` are sigma-scaled scores (the nets' -eps_hat outputs), ``divs``
    their Hutchinson divergence estimates of shape (B, 1). Returns kappa of
    shape (B, 1) (broadcastable over flattened feature dims) — callers with
    image tensors reshape accordingly via :func:`combine_kappa`.
    """
    s1, s2 = scores
    div1, div2 = divs
    d = s1 - s2
    axes = tuple(range(1, s1.ndim))
    num = sigma_t * (div1 - div2).reshape(s1.shape[0]) + jnp.sum(s1 * d, axis=axes)
    den = jnp.sum(d * d, axis=axes) + 1e-12
    kappa = num / den
    if clip is not None:
        kappa = jnp.clip(kappa, clip[0], clip[1])
    return kappa


def combine_kappa(kappa: Array, s1: Array, s2: Array) -> Array:
    """s = s2 + kappa (s1 - s2), kappa of shape (B,)."""
    k = kappa.reshape(kappa.shape[0], *([1] * (s1.ndim - 1)))
    return s2 + k * (s1 - s2)


# 3. ---------------------------------------------------------------------
def or_softmax(log_q: Array, temp: float = 1.0, bias=0.0) -> Array:
    """SUPERDIFF OR: kappa = softmax(temp * log_q + bias) over expert axis 0.

    ``log_q``: (K, B) running log-densities. Returns (K, B) kappas.

    ``bias`` only tilts the blend when it is PER-EXPERT (shape (K,) or
    (K, 1), broadcast over the batch): softmax is shift-invariant, so a
    scalar bias is a mathematical no-op. The reference's own scalar ``bias``
    parameter (src/diffusion/samplers.py:27) is equally inert — but
    silently accepting it lets a user sweep bias and sweep nothing, so a
    concrete non-zero scalar raises instead of no-oping (VERDICT r2 weak-6).
    """
    b = jnp.asarray(bias, log_q.dtype) if not isinstance(bias, jax.Array) \
        else bias
    if b.ndim == 0:
        if not isinstance(b, jax.core.Tracer) and float(b) != 0.0:
            raise ValueError(
                "or_softmax: a scalar bias is inert (softmax is "
                "shift-invariant); pass a per-expert bias of shape (K,) "
                "to tilt the blend, or 0.0")
        return jax.nn.softmax(temp * log_q, axis=0)
    if b.ndim == 1:
        b = b[:, None]                    # (K,) -> (K, 1), broadcast over B
    return jax.nn.softmax(temp * log_q + b, axis=0)


def and_heuristic(log_q: Array) -> Array:
    """Heuristic AND: softmax(-log_q) — pushes toward the equal-density state."""
    return jax.nn.softmax(-log_q, axis=0)


def _row_bias(bias, k: int, dtype):
    """Bias for the K-1 equal-density rows of the AND linear system.

    Scalar bias is meaningful here (it tilts every density-change-equality
    row, unlike the shift-invariant OR softmax). A per-expert bias of shape
    (K,) tilts expert log-density targets, entering the rows as consecutive
    differences bias[r+1] - bias[r]."""
    b = jnp.asarray(bias, dtype)
    if b.ndim == 0:
        return b
    if b.shape == (k,):
        return b[1:] - b[:-1]             # (K-1,) row tilts
    raise ValueError(f"bias must be a scalar or shape ({k},); got {b.shape}")


# 4. ---------------------------------------------------------------------
def and_solve(a: Array, b: Array, bias=0.0) -> Array:
    """Rigorous SUPERDIFF AND (Prop. 6) for K=2, vectorized over batch.

    Inputs are per-expert inner products computed by the sampler:
      a: (B, 2, 2) with a[r, c] = d_tau * <reverse_drift_c, score_r>
      b: (B, 2)    with b[r] = deterministic + stochastic density-change terms
    Solves [[a00-a10, a01-a11], [1, 1]] kappa = [b1 - b0 + bias, 1],
    then clamps kappa to [0, 1] and renormalizes; a singular system falls back
    to (0.5, 0.5) (parity with the torch.linalg.LinAlgError fallback).

    Returns kappa of shape (B, 2).
    """
    a00, a01 = a[:, 0, 0], a[:, 0, 1]
    a10, a11 = a[:, 1, 0], a[:, 1, 1]
    # closed-form 2x2 solve: [[p, q], [1, 1]] k = [r, 1]
    p, q = a00 - a10, a01 - a11
    r = b[:, 1] - b[:, 0] + _row_bias(bias, 2, b.dtype)
    det = p - q
    safe = jnp.abs(det) > 1e-12
    k0 = jnp.where(safe, (r - q) / jnp.where(safe, det, 1.0), 0.5)
    k1 = 1.0 - k0
    kappa = jnp.stack([k0, k1], axis=1)
    kappa = jnp.clip(kappa, 0.0, 1.0)
    total = jnp.sum(kappa, axis=1, keepdims=True)
    kappa = jnp.where(total > 0, kappa / jnp.maximum(total, 1e-12), 0.5)
    return kappa


def and_solve_k(a: Array, b: Array, bias=0.0) -> Array:
    """K-expert generalization of :func:`and_solve` (beyond-reference: the
    reference's linear-system AND is hardcoded to 2 experts,
    src/..._6_1.py:369-401).

    Equal-density-change condition between consecutive experts gives K-1
    rows ``sum_c (a[r,c] - a[r+1,c]) kappa_c = b[r+1] - b[r] + bias`` plus
    the simplex row ``sum kappa = 1``; solved as a batched K x K system.
    Non-finite solutions (singular systems) fall back to uniform 1/K, then
    kappa is clamped to [0, 1] and renormalized (the 2-expert semantics).

    a: (B, K, K) with a[r, c] = d_tau * <reverse_drift_c, score_r>
    b: (B, K) density-change terms. Returns (B, K).
    """
    bsz, k = b.shape
    rows = a[:, :-1, :] - a[:, 1:, :]                    # (B, K-1, K)
    simplex = jnp.ones((bsz, 1, k), a.dtype)
    mat = jnp.concatenate([rows, simplex], axis=1)       # (B, K, K)
    rhs = jnp.concatenate(
        [b[:, 1:] - b[:, :-1] + _row_bias(bias, k, b.dtype),
         jnp.ones((bsz, 1), b.dtype)], axis=1)
    # guard the solve itself: a singular matrix must not poison the batch
    det = jnp.linalg.det(mat)
    safe = jnp.abs(det) > 1e-12
    eye = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), mat.shape)
    kappa = jnp.linalg.solve(jnp.where(safe[:, None, None], mat, eye),
                             rhs[..., None]).squeeze(-1)
    ok = safe & jnp.all(jnp.isfinite(kappa), axis=1)
    kappa = jnp.where(ok[:, None], kappa, 1.0 / k)
    kappa = jnp.clip(kappa, 0.0, 1.0)
    total = jnp.sum(kappa, axis=1, keepdims=True)
    return jnp.where(total > 0, kappa / jnp.maximum(total, 1e-12), 1.0 / k)


# 5. ---------------------------------------------------------------------
def cfg(eps_uncond: Array, eps_cond_stack: Array, weights: Array) -> Array:
    """Classifier-free-guidance composition:

    eps = eps_uncond + sum_i w_i (eps_cond_i - eps_uncond)

    ``eps_cond_stack``: (K, B, ...) conditional predictions; ``weights``: (K,).
    """
    w = _kexp(weights, eps_cond_stack)
    return eps_uncond + jnp.sum(w * (eps_cond_stack - eps_uncond[None]), axis=0)


# 6. ---------------------------------------------------------------------
def resolve_occlusion(masks: Array) -> Array:
    """Turn possibly-overlapping (K, H, W) masks into disjoint ones.

    The LAST mask is on top: iterating from the top down, each model keeps
    only the region not already claimed (parity with
    composing_colored_digit_to_simulate_overlaying.py:69-80).
    """
    k = masks.shape[0]

    def body(occ, i):
        idx = k - 1 - i
        unique = jnp.clip(masks[idx] - occ, 0.0, 1.0)
        return occ + unique, (idx, unique)

    _, (order, uniques) = jax.lax.scan(body, jnp.zeros_like(masks[0]),
                                       jnp.arange(k))
    # un-reverse: uniques[i] corresponds to mask index k-1-i
    return uniques[::-1]


def masked(eps_stack: Array, masks: Array) -> Array:
    """Spatially-masked score sum: eps = sum_i eps_i * mask_i.

    ``masks``: disjoint (K, H, W) from :func:`resolve_occlusion`; broadcast
    over batch and channel dims of the NHWC eps stack.
    """
    m = masks[:, None, :, :, None]  # (K, 1, H, W, 1)
    return jnp.sum(eps_stack * m, axis=0)


# 7. ---------------------------------------------------------------------
def fixed(eps_stack: Array, kappa: Array) -> Array:
    """Fixed-kappa blend: eps = sum_i kappa_i eps_i (no normalization)."""
    return jnp.sum(_kexp(kappa, eps_stack) * eps_stack, axis=0)


# 8. ---------------------------------------------------------------------
LUMA_W = (0.299, 0.587, 0.114)  # ITU-R 601 (torchvision Grayscale)


def projected(eps_full: Array, eps_sub: Array, weight: Array = 1.0,
              proj: Array = LUMA_W) -> Array:
    """Orthogonal projection-substitution composition (beyond-reference op).

    A subspace expert (e.g. a grayscale shape expert) only ever observes
    P x with P = w/||w|| a unit-norm channel projection, so its prediction
    estimates the PROJECTED noise P eps — not the full noise. The
    reference's channel-broadcast average
    (shapes/compose_images_ddim.py:52-57) therefore blends a subspace
    estimate into every channel and the result is no longer a consistent
    full-noise estimate (the sampler under-denoises; measured: pure-noise
    grids at any training budget). Substituting along P's row space fixes
    this exactly:

        eps = eps_full + weight * P^T (eps_sub - P eps_full)

    weight=1 replaces the luma component of the full-space expert's eps
    with the subspace expert's estimate (both are estimates of the SAME
    quantity P eps, so the combined vector stays a consistent noise
    estimate); weight>1 over-steers as guidance. The chrominance
    (orthogonal complement) stays entirely with the full-space expert.
    Pair with a subspace expert trained on data projected by the SAME
    unit-norm P (data.make_shapes_dataset(grayscale="luma_norm"),
    experts.rgb_to_gray(x, normalized=True)).
    """
    w = jnp.asarray(proj, eps_full.dtype)
    w = w / jnp.sqrt(jnp.sum(w * w))
    p_full = jnp.sum(eps_full * w, axis=-1, keepdims=True)   # P eps_full
    return eps_full + weight * (eps_sub - p_full) * w
