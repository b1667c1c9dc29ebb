"""Training: jitted denoising-score-matching steps + device-resident loops.

TPU shape (SURVEY.md §3.1): the dataset lives in HBM, each step gathers its
batch with ``jnp.take`` inside the jitted step, and whole epochs run as one
``lax.scan`` — zero host<->device copies in the hot loop (the reference's
DataLoader-per-batch host boundary disappears).

Loss: eps-prediction MSE, continuous t ~ U(t_min, 1) with q_t
(/root/reference/mnist/train_image.py:41-53) or discrete t ~ U{0..T-1} with
q_sample (/root/reference/src/composing_colored_mnist.py:203-234).
CFG null-token dropout (UNCOND_PROB) follows src/..._5.py:241-242.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from .schedules import DDPMSchedule, VPSchedule

Array = jax.Array
Params = Any
Schedule = Union[VPSchedule, DDPMSchedule]


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: int = 0


def make_loss_fn(apply_fn: Callable[..., Array], schedule: Schedule,
                 t_min: float = 1e-3, uncond_prob: float = 0.0,
                 null_labels: Optional[Sequence[int]] = None,
                 time_first: bool = False, predict: str = "eps",
                 snr_gamma: Optional[float] = None):
    """Denoising MSE loss. ``apply_fn(params, x, t, *labels)`` predicts eps
    (``time_first`` flips to the MLP convention apply_fn(params, t, x, ...)).

    ``predict`` selects the parameterization the network is trained to
    output: "eps" (noise, the default everywhere), "x0" (the clean image —
    the reference's cross-attention model is an x0-predictor: trained
    against target_rgb at compositional_diffusion_with_cross_attention.py:259
    and consumed as x-hat-0 in its sampler at :301-313), or "v" (velocity,
    Salimans & Ho 2022: v = alpha*eps - sigma*x0 — the
    distillation-friendly parameterization; requires the true-VP
    ``VPSchedule(kind="stable")`` since its inversion identities need
    alpha^2 + sigma^2 = 1). Pair with ``samplers.ddim(..., predict=...)``.

    ``snr_gamma`` enables min-SNR loss weighting (Hang et al. 2023,
    gamma = 5 typical): per-sample weight min(SNR, gamma)/SNR for eps
    targets (min(SNR, gamma) for x0, min(SNR, gamma)/(SNR + 1) for v),
    SNR = alpha^2/sigma^2 — downweights the near-t=0 steps whose huge SNR
    otherwise dominates the eps objective."""
    if predict not in ("eps", "x0", "v"):
        raise ValueError(f"predict must be 'eps', 'x0' or 'v', "
                         f"got {predict!r}")
    discrete = isinstance(schedule, DDPMSchedule)
    if predict == "v" and (discrete or schedule.kind != "stable"):
        raise ValueError("predict='v' needs VPSchedule(kind='stable') — the "
                         "v identities assume alpha^2 + sigma^2 = 1")

    def loss_fn(params: Params, key: Array, x0: Array,
                labels: Tuple[Array, ...] = ()) -> Array:
        kt, ke, kd = jax.random.split(key, 3)
        bs = x0.shape[0]
        if discrete:
            t = jax.random.randint(kt, (bs,), 0, schedule.num_timesteps)
            xt, eps = schedule.q_sample(ke, x0, t)
            t_in = t.astype(jnp.float32)
        else:
            t = jax.random.uniform(kt, (bs,), minval=t_min, maxval=1.0)
            xt, eps = schedule.q_t(ke, x0, t)
            t_in = t
        if uncond_prob > 0.0 and labels:
            assert null_labels is not None
            drop = jax.random.uniform(kd, (bs,)) < uncond_prob
            labels = tuple(
                jnp.where(drop, jnp.asarray(nl, lab.dtype), lab)
                for lab, nl in zip(labels, null_labels))
        if time_first:
            out = apply_fn(params, t_in, xt, *labels)
        else:
            out = apply_fn(params, xt, t_in, *labels)
        if predict == "v":
            bc = (-1,) + (1,) * (x0.ndim - 1)
            a = schedule.alpha(t).reshape(bc)
            s = schedule.sigma(t).reshape(bc)
            target = a * eps - s * x0
        else:
            target = x0 if predict == "x0" else eps
        sq = (out - target) ** 2
        if snr_gamma is None:
            return jnp.mean(sq)
        if discrete:
            a_t = jnp.take(schedule.sqrt_alphas_cumprod, t)
            s_t = jnp.take(schedule.sqrt_one_minus_alphas_cumprod, t)
        else:
            a_t, s_t = schedule.alpha(t), schedule.sigma(t)
        snr = (a_t / jnp.maximum(s_t, 1e-8)) ** 2
        if predict == "x0":
            w = jnp.minimum(snr, snr_gamma)
        elif predict == "v":
            w = jnp.minimum(snr, snr_gamma) / (snr + 1.0)
        else:
            w = jnp.minimum(snr, snr_gamma) / jnp.maximum(snr, 1e-8)
        per_sample = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
        return jnp.mean(w * per_sample)

    return loss_fn


def make_train_step(loss_fn, tx: optax.GradientTransformation):
    """One jitted optimizer step; donate params/opt_state for in-place update."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, x0, labels=()):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, x0, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_train_chunk(apply_fn: Callable[..., Array], schedule: Schedule,
                     tx: optax.GradientTransformation, *,
                     batch_size: int, uncond_prob: float = 0.0,
                     null_labels: Optional[Sequence[int]] = None,
                     time_first: bool = False,
                     ema_decay: Optional[float] = None,
                     predict: str = "eps",
                     snr_gamma: Optional[float] = None):
    """Jitted multi-step training chunk: ``length`` optimizer steps fused in
    one ``lax.scan``; batches gathered with ``jnp.take`` inside the program.

    The dataset is an ARGUMENT (not a closure constant) so the jit cache keys
    on its shape — callers (and the benchmark) can warm the exact program
    once and reuse it across datasets/calls without recompiling.

    With ``ema_decay`` set (truthy — ``None`` and ``0.0`` both mean off, the
    same convention as ``train_expert``), the chunk signature grows an
    ``ema_params`` arg/return (EMA tracked inside the scan — standard
    diffusion sample-quality practice, beyond the reference's
    raw-final-params sampling).
    """

    loss_fn = make_loss_fn(apply_fn, schedule, uncond_prob=uncond_prob,
                           null_labels=null_labels, time_first=time_first,
                           predict=predict, snr_gamma=snr_gamma)

    def step(params, opt_state, k, images, labels):
        n = images.shape[0]
        kb, kl = jax.random.split(k)
        idx = jax.random.randint(kb, (batch_size,), 0, n)
        x0 = jnp.take(images, idx, axis=0)
        batch_labels = tuple(jnp.take(lab, idx, axis=0) for lab in labels)
        loss, grads = jax.value_and_grad(loss_fn)(params, kl, x0,
                                                  batch_labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if not ema_decay:  # None OR 0.0: EMA off (matches train_expert's gate)
        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("length",))
        def run_chunk(params, opt_state, chunk_key, images, labels=(), *,
                      length: int):
            def body(carry, i):
                params, opt_state = carry
                params, opt_state, loss = step(
                    params, opt_state, jax.random.fold_in(chunk_key, i),
                    images, labels)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(length))
            return params, opt_state, losses

        return run_chunk

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("length",))
    def run_chunk_ema(params, opt_state, ema_params, chunk_key, images,
                      labels=(), *, length: int):
        def body(carry, i):
            params, opt_state, ema = carry
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(chunk_key, i),
                images, labels)
            ema = ema_update(ema, params, ema_decay)
            return (params, opt_state, ema), loss

        (params, opt_state, ema_params), losses = jax.lax.scan(
            body, (params, opt_state, ema_params), jnp.arange(length))
        return params, opt_state, ema_params, losses

    return run_chunk_ema


def train_expert(key: Array, apply_fn: Callable[..., Array], params: Params,
                 schedule: Schedule, images: Array,
                 labels: Tuple[Array, ...] = (), *, steps: int = 1000,
                 batch_size: int = 128, lr: float = 2e-4,
                 uncond_prob: float = 0.0,
                 null_labels: Optional[Sequence[int]] = None,
                 time_first: bool = False,
                 steps_per_scan: int = 100,
                 ema_decay: Optional[float] = None,
                 predict: str = "eps",
                 snr_gamma: Optional[float] = None,
                 clip_norm: Optional[float] = None,
                 adam_eps: float = 1e-8) -> Tuple[Params, Array]:
    """Train one expert on a device-resident dataset. Returns (params, losses)
    — with ``ema_decay`` set, params are the EMA tree (the sampling-quality
    standard; the raw final tree is discarded).

    The loop runs as chunks of ``steps_per_scan`` steps fused into single
    ``lax.scan`` calls; batches are sampled with replacement inside the scan.

    ``clip_norm`` prepends global-norm gradient clipping to Adam;
    ``adam_eps`` raises Adam's epsilon. Both exist because of a measured
    instability, and NEITHER is its fix — the knob ladder is archived in
    artifacts/quality_gate_shapes_r5/p8_divergence_repro.log: the 64x64
    shapes DiT expert (p8/d256/l8, bf16) under min-SNR(gamma=5) weighting
    trains to loss ~0.001 and then detonates to a permanent ~0.9 at
    ~10-12k steps (lr 2e-4), ~12-16k (1e-4), ~16-20k (5e-5), with
    clip_norm=1.0 in every case; adam_eps=1e-5 turns the plateau into a
    runaway (loss 1000+). Dropping ``snr_gamma`` is the measured fix:
    plain-loss training is stable through 24k steps (final 0.0006, max
    spike 0.02) at the original lr 2e-4. The knobs remain for recipes
    that want them; quality_gate_shapes documents the interaction.
    """
    adam = optax.adam(lr, eps=adam_eps)
    tx = (optax.chain(optax.clip_by_global_norm(clip_norm), adam)
          if clip_norm else adam)
    # private copies: the chunks donate their inputs, and donation must never
    # consume the caller's arrays (they may be reused across calls)
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = tx.init(params)
    run_chunk = make_train_chunk(
        apply_fn, schedule, tx, batch_size=batch_size,
        uncond_prob=uncond_prob, null_labels=null_labels,
        time_first=time_first, ema_decay=ema_decay, predict=predict,
        snr_gamma=snr_gamma)
    ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None

    all_losses = []
    steps_per_scan = min(steps_per_scan, steps)
    chunk_lengths = [steps_per_scan] * (steps // steps_per_scan)
    if steps % steps_per_scan:
        chunk_lengths.append(steps % steps_per_scan)
    for c, length in enumerate(chunk_lengths):
        if ema_decay:
            params, opt_state, ema, losses = run_chunk(
                params, opt_state, ema, jax.random.fold_in(key, c), images,
                labels, length=length)
        else:
            params, opt_state, losses = run_chunk(
                params, opt_state, jax.random.fold_in(key, c), images, labels,
                length=length)
        all_losses.append(losses)
    return (ema if ema_decay else params), jnp.concatenate(all_losses)


def train_expert_resumable(key: Array, apply_fn: Callable[..., Array],
                           params: Params, schedule: Schedule, images: Array,
                           ckpt_mgr, name: str,
                           labels: Tuple[Array, ...] = (), *,
                           steps: int = 1000, batch_size: int = 128,
                           lr: float = 2e-4, uncond_prob: float = 0.0,
                           null_labels: Optional[Sequence[int]] = None,
                           time_first: bool = False,
                           steps_per_scan: int = 100,
                           keep: int = 3,
                           ema_decay: Optional[float] = None,
                           predict: str = "eps",
                           snr_gamma: Optional[float] = None,
                           clip_norm: Optional[float] = None,
                           adam_eps: float = 1e-8
                           ) -> Tuple[Params, Array]:
    """``train_expert`` with preemption recovery (SURVEY.md §5.3 — a NEW
    capability over the reference's save-only checkpoints).

    After every ``steps_per_scan`` chunk the full state
    {params, opt_state, step} is checkpointed via ``ckpt_mgr.save_step``
    (keep-latest-k). On start, the newest step checkpoint of ``name`` is
    restored and training continues from there. Chunk keys derive from
    ``fold_in(key, chunk_index)``, so a killed-and-resumed run produces
    BITWISE the same params as an uninterrupted one (tests/test_train.py).

    With ``ema_decay`` set, the EMA tree rides the step checkpoints
    (``ema_params`` key) so resume stays bitwise, and the EMA params are
    returned — same contract as ``train_expert``. Step checkpoints written
    without EMA cannot be resumed with it (structure mismatch — re-run or
    drop the flag). ``clip_norm``/``adam_eps`` as in ``train_expert``.
    """
    adam = optax.adam(lr, eps=adam_eps)
    tx = (optax.chain(optax.clip_by_global_norm(clip_norm), adam)
          if clip_norm else adam)
    # private copies: the chunks donate their inputs, and donation must never
    # consume the caller's arrays (they may be reused across calls)
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = tx.init(params)
    run_chunk = make_train_chunk(
        apply_fn, schedule, tx, batch_size=batch_size,
        uncond_prob=uncond_prob, null_labels=null_labels,
        time_first=time_first, ema_decay=ema_decay, predict=predict,
        snr_gamma=snr_gamma)
    ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None

    state_like = {"params": params, "opt_state": opt_state,
                  "step": jnp.zeros((), jnp.int32)}
    if ema_decay:
        state_like["ema_params"] = ema
    try:
        restored, start_step = ckpt_mgr.restore_latest(name, state_like)
    except Exception as e:
        if ema_decay:
            # the actionable failure here is on-disk step checkpoints
            # written before EMA was requested (no ema_params key) — orbax
            # raises an opaque tree-structure mismatch
            raise RuntimeError(
                f"could not restore step checkpoints for {name!r} with "
                "ema_decay set — if they were written without EMA, finish "
                "the run with ema_decay=0 or start a fresh checkpoint dir"
            ) from e
        raise
    if restored is not None:
        params, opt_state = restored["params"], restored["opt_state"]
        if ema_decay:
            ema = restored["ema_params"]

    # full chunks + a shorter remainder chunk (never drop steps)
    steps_per_scan = min(steps_per_scan, steps)
    chunk_lengths = [steps_per_scan] * (steps // steps_per_scan)
    if steps % steps_per_scan:
        chunk_lengths.append(steps % steps_per_scan)
    all_losses = []
    chunk_end = 0
    for c, length in enumerate(chunk_lengths):
        chunk_end += length
        # skip chunks whose END the restored checkpoint already covers —
        # comparing chunk INDEX against start_step // steps_per_scan
        # re-ran the remainder chunk (steps % steps_per_scan != 0) after a
        # restore from its own checkpoint, over-training by the remainder
        if chunk_end <= start_step:
            continue
        if ema_decay:
            params, opt_state, ema, losses = run_chunk(
                params, opt_state, ema, jax.random.fold_in(key, c), images,
                labels, length=length)
        else:
            params, opt_state, losses = run_chunk(
                params, opt_state, jax.random.fold_in(key, c), images, labels,
                length=length)
        all_losses.append(losses)
        done = min((c + 1) * steps_per_scan, steps)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.asarray(done, jnp.int32)}
        if ema_decay:
            state["ema_params"] = ema
        ckpt_mgr.save_step(name, state, done, keep=keep)
    ckpt_mgr.flush()  # async saves must be durable before we report done
    losses = (jnp.concatenate(all_losses) if all_losses
              else jnp.zeros((0,), jnp.float32))
    return (ema if ema_decay else params), losses


def ema_update(ema_params: Params, params: Params,
               decay: float = 0.999) -> Params:
    """Exponential moving average of params (standard for diffusion sample
    quality; a production-training capability beyond the reference, which
    samples from the raw final params). Use inside the jitted step/chunk:
    ``ema = ema_update(ema, params)``; sample with the EMA tree."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def one_step_denoise_val(apply_fn, params, schedule: VPSchedule, key: Array,
                         shape: Tuple[int, ...], t_val: float = 0.9,
                         labels: Tuple[Array, ...] = ()) -> Array:
    """The reference's quick smoke validation: noise -> q_t -> one-step x0
    estimate (mnist/train_image.py:56-64)."""
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, shape)
    t = jnp.full((shape[0],), t_val)
    xt, _ = schedule.q_t(k2, noise, t)
    eps_hat = apply_fn(params, xt, t, *labels)
    a = schedule.alpha(t).reshape(-1, 1, 1, 1)
    s = schedule.sigma(t).reshape(-1, 1, 1, 1)
    return jnp.clip((xt - s * eps_hat) / a, -1.0, 1.0)
