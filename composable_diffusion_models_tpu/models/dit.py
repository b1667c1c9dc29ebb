"""Diffusion Transformer (DiT) score model — beyond-reference capability.

The reference repo is UNet-only (SURVEY.md §2.2). A patchify-transformer
backbone (Peebles & Xie 2023, "Scalable Diffusion Models with Transformers",
adaLN-Zero variant) is the natural TPU-first alternative: the measured
throughput ceiling of the reference's pre-norm conv UNet on this chip is the
GroupNorm HBM passes interleaved between every conv pair (DESIGN.md §3 —
~0.4 ms of pure bandwidth per GN at 28x28x64 that XLA cannot fuse into the
neighboring convs). A DiT spends its time in dense matmuls (attention + MLP
over tokens) whose LayerNorms fuse into the surrounding GEMM epilogues, so
the same FLOP budget lands on the MXU at a higher sustained rate.

Drop-in: ``apply(params, x, t, *labels)`` with NHWC in/out exactly like
``UNet`` — every sampler, composition operator, ``ExpertStack``, training
loop, and parallel step works unchanged. Conditioning uses the same label
contract (``num_classes`` slots + optional ``null_token`` row for CFG).

adaLN-Zero: each block's modulation MLP and the final projection initialize
to zero, so the network IS the zero function at init (identity residual
stream) — the property Peebles & Xie found critical for stable large-depth
training; pinned by a test.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .embeddings import TimeEmbedding, sinusoidal_embedding
from ..ops.pallas_kernels import fused_dit_block, short_seq_attention

Array = jax.Array


def _modulate(x: Array, shift: Array, scale: Array) -> Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class FusedQKVAttention(nn.Module):
    """Self-attention for SHORT token sequences, one QKV GEMM.

    ``nn.MultiHeadDotProductAttention`` issues three separate input
    projections and keeps per-head minor dims (head_dim 32 at the flagship's
    dim 256 / 8 heads — a 32-of-128-lane layout that pads 4x on every
    reshape/transpose around the score matmuls). At 16 tokens the attention
    FLOPs are negligible; the *passes* are not. This module folds Q,K,V into
    ONE ``(B*T, dim) x (dim, 3*dim)`` GEMM (M = B*T fills the MXU), keeps
    the scores in a single einsum pair, and applies the output projection as
    one more full-width GEMM. Same math as MHDPA with default flax settings
    (scale 1/sqrt(head_dim), no attention bias) in exact arithmetic,
    different param tree; under bf16 the two differ in softmax precision —
    this module keeps fp32 softmax stats (repo numerics policy) where stock
    flax 0.12 softmaxes in bf16 (force_fp32_for_softmax=False default), so
    the fused path is strictly the more precise one (ADVICE r3).
    """

    dim: int
    n_heads: int
    pallas_attn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, h: Array) -> Array:
        b, n_tok, _ = h.shape
        hd = self.dim // self.n_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        if self.pallas_attn:
            # fused scores+softmax+value kernel: one VMEM pass, images
            # packed to MXU-aligned row blocks (ops/pallas_kernels.py)
            out = short_seq_attention(qkv, self.n_heads)
        else:
            qkv = qkv.reshape(b, n_tok, 3, self.n_heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(hd, h.dtype))
            # fp32 softmax stats (numerics policy), bf16 value matmul
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(h.dtype),
                             v).reshape(b, n_tok, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning."""

    dim: int
    n_heads: int
    mlp_ratio: int = 4
    qkv_fused: bool = False
    pallas_attn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        # 6 modulation vectors from the conditioning, zero-init so the block
        # is the identity at initialization
        mod = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype)(nn.silu(c))
        sa_shift, sa_scale, sa_gate, mlp_shift, mlp_scale, mlp_gate = (
            jnp.split(mod, 6, axis=-1))
        # LN in fp32 (repo numerics policy: norm stats out of bf16),
        # scale/shift come from the modulation instead of LN params
        h = nn.LayerNorm(use_scale=False, use_bias=False,
                         dtype=jnp.float32)(x).astype(x.dtype)
        h = _modulate(h, sa_shift, sa_scale)
        if self.qkv_fused:
            h = FusedQKVAttention(self.dim, self.n_heads,
                                  pallas_attn=self.pallas_attn,
                                  dtype=self.dtype)(h)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, dtype=self.dtype)(h, h)
        x = x + sa_gate[:, None, :] * h
        h = nn.LayerNorm(use_scale=False, use_bias=False,
                         dtype=jnp.float32)(x).astype(x.dtype)
        h = _modulate(h, mlp_shift, mlp_scale)
        h = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + mlp_gate[:, None, :] * h


class DiT(nn.Module):
    """Patchify -> N adaLN-Zero blocks -> zero-init linear unpatchify.

    Args:
      patch:       patch edge; img_size % patch == 0 (28 -> patch 4 = 49
                   tokens).
      dim/depth/n_heads: transformer width/depth/heads.
      in_channels: image channels (output matches).
      num_classes: label slots, same contract as UNet (embeddings are ADDED
                   to the time conditioning vector).
      null_token:  reserve one extra row per slot for CFG dropout.
      pallas_attn: INFERENCE-ONLY — routes attention through the fused
                   ``ops.short_seq_attention`` Pallas kernel, which has no
                   autodiff rule (``jax.grad`` through it raises). Training
                   always runs ``DiT.apply`` with the default einsum path;
                   serving uses ``make_folded_apply`` (where the kernel —
                   or the whole-block ``fused_dit_block`` — is the measured
                   default on TPU). CI exercises the kernels in interpret
                   mode (test_pallas_kernels.py); hardware lowering is
                   validated by the on-TPU measurements in DESIGN.md §3.3.

    Unlike the (fully convolutional, size-agnostic) UNet, the learned
    positional embedding ties a checkpoint to one image size — init and
    train at the data's true resolution.
    """

    patch: int = 4
    dim: int = 256
    depth: int = 6
    n_heads: int = 8
    in_channels: int = 1
    num_classes: Sequence[int] = ()
    null_token: bool = False
    qkv_fused: bool = False
    pallas_attn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, *labels: Array) -> Array:
        b, h, w, cin = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(f"img {h}x{w} not divisible by patch "
                             f"{self.patch}")
        gh, gw = h // self.patch, w // self.patch
        n_tok = gh * gw

        t = jnp.asarray(t)
        if t.ndim == 0:
            # batch-constant scalar t from the samplers' scan bodies — same
            # batch-1 broadcast trick as UNet (unet.py:311-317)
            t = t[None]
        # conditioning vector: time + summed label embeddings (UNet contract)
        c = TimeEmbedding(self.dim, self.dim, dtype=self.dtype)(t)
        if self.num_classes:
            assert len(labels) == len(self.num_classes), (
                f"model takes {len(self.num_classes)} label slots, "
                f"got {len(labels)}")
            for i, n in enumerate(self.num_classes):
                vocab = n + (1 if self.null_token else 0)
                c = c + nn.Embed(vocab, self.dim, dtype=self.dtype,
                                 name=f"label_emb_{i}")(labels[i])

        # patchify as a strided conv (lowers to one GEMM on TPU)
        tok = nn.Conv(self.dim, kernel_size=(self.patch, self.patch),
                      strides=(self.patch, self.patch), padding="VALID",
                      dtype=self.dtype, name="patchify")(x)
        tok = tok.reshape(b, n_tok, self.dim)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, n_tok, self.dim))
        tok = tok + pos.astype(tok.dtype)

        for i in range(self.depth):
            tok = DiTBlock(self.dim, self.n_heads, dtype=self.dtype,
                           qkv_fused=self.qkv_fused,
                           pallas_attn=self.pallas_attn,
                           name=f"block_{i}")(tok, c)

        # final adaLN + zero-init projection (fp32 output head, repo policy)
        mod = nn.Dense(2 * self.dim, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="final_mod")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        tok = nn.LayerNorm(use_scale=False, use_bias=False,
                           dtype=jnp.float32)(tok).astype(tok.dtype)
        tok = _modulate(tok, shift, scale)
        out = nn.Dense(self.patch * self.patch * self.in_channels,
                       kernel_init=nn.initializers.zeros,
                       dtype=jnp.float32, name="unpatchify")(
                           tok.astype(jnp.float32))
        out = out.reshape(b, gh, gw, self.patch, self.patch, self.in_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w,
                                                       self.in_channels)


# ---------------------------------------------------------------------------
# Folded serving path: adaLN modulation as per-step GEMM weight transforms.
#
# In every sampler scan body the time input t is batch-constant (the DDIM/SDE
# samplers pass one scalar per step — samplers.py), and composition cells
# condition every sample in the batch on the same label. The conditioning
# vector c is therefore batch-size 1, and each block's six adaLN vectors
# (shift, scale, gate) x (attention, MLP) are *per-step constants*. By
# linearity they fold into the adjacent GEMMs:
#
#   (LN(x) * (1+scale) + shift) @ W + b  ==  LN(x) @ (W * (1+scale)[:,None])
#                                            + (b + shift @ W)
#   x + gate * (h @ Wp + bp)             ==  x + h @ (Wp * gate[None,:])
#                                            + bp * gate
#
# so the folded forward runs norm-stats -> GEMM -> attention -> GEMM ->
# residual with ZERO modulate/gate elementwise passes over the (B, N, D)
# activations; the fold itself is O(D^2) per step per block — at the
# flagship's batch sizes 3-4 orders of magnitude below the per-sample GEMM
# work. Patchify/unpatchify run as reshape+GEMM instead of the strided conv
# (the conv emitter sustained only 1.2 TF/s on the patch-7 shapes —
# DESIGN.md §3.1 per-op table). Same math as DiT.apply (exact in real
# arithmetic; bf16 rounding sites move — parity pinned by
# test_models.py::TestFoldedDiT), same parameter tree (both the qkv_fused
# and the stock-MHDPA checkpoint layouts are accepted), so quality-gate
# verdicts carry over to the folded serving path unchanged.
# ---------------------------------------------------------------------------


def _ln_nostats_fp32(x: Array) -> Array:
    """flax LayerNorm(use_scale=False, use_bias=False, dtype=fp32) parity:
    fp32 stats (fast-variance form, clamped), eps 1e-6, cast back."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True) - mu * mu)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _attn_kernels(bp, dim: int):
    """(Wqkv, bqkv, Wproj, bproj) from either attention parameter layout.

    FusedQKVAttention stores them directly; the stock flax MHDPA tree keeps
    per-head (D, H, hd) kernels — reshaped/concatenated here exactly as the
    transplant parity test does (test_models.py). The reshape is
    scan-invariant (independent of t), so XLA hoists it out of the sampler
    loop."""
    if "FusedQKVAttention_0" in bp:
        a = bp["FusedQKVAttention_0"]
        return (a["qkv"]["kernel"], a["qkv"]["bias"],
                a["proj"]["kernel"], a["proj"]["bias"])
    a = bp["MultiHeadDotProductAttention_0"]
    w_qkv = jnp.concatenate(
        [a[k]["kernel"].reshape(dim, -1) for k in ("query", "key", "value")],
        axis=1)
    b_qkv = jnp.concatenate(
        [a[k]["bias"].reshape(-1) for k in ("query", "key", "value")])
    return w_qkv, b_qkv, a["out"]["kernel"].reshape(-1, dim), a["out"]["bias"]


def _batch1(name: str, arr: Array) -> Array:
    arr = jnp.asarray(arr)
    if arr.ndim == 0:
        arr = arr[None]
    if arr.shape[0] != 1:
        raise ValueError(
            f"folded DiT requires batch-constant conditioning: {name} has "
            f"leading dim {arr.shape[0]}, expected 1 (per-sample modulation "
            f"vectors cannot fold into shared GEMM weights — use DiT.apply)")
    return arr


def make_folded_apply(model: DiT, fold_ln: bool = False,
                      pallas_attn: bool | None = None,
                      fused_block: bool | None = None,
                      attn_mode: str = "packed"):
    """Build ``apply(params, x, t, *labels)`` computing ``model.apply`` with
    per-step adaLN folding (see module comment above). Drop-in for
    ``ExpertStack``/samplers; requires t (and every label) batch-size 1.

    ``fold_ln=True`` additionally folds the LayerNorm NORMALIZATION into the
    GEMM epilogue: with per-row stats (mu, sigma) and the per-step constant
    column-sum vector s = 1^T W',

        LN(x) @ W' + b'  ==  (x @ W' - mu * s) / sigma + b'

    so the GEMM reads the RAW residual stream (no separate normalize
    write+read of the (B, N, D) activation — 2 sites x depth blocks) and
    the whole correction is an elementwise epilogue XLA fuses into the
    GEMM output. Stats stay fp32; the epilogue subtracts in fp32 (the
    cancellation x ~ mu*1 + small is the numerically delicate spot; bf16
    subtraction there would lose the signal). Exact in real arithmetic;
    bf16 rounding sites move — parity + quality pinned by TestFoldedDiT
    and the quality gate.

    ``pallas_attn`` routes the scores+softmax+value chain through the fused
    ``ops.short_seq_attention`` kernel (None = auto: Pallas on TPU, einsum
    fallback elsewhere; a bool forces one path). Same attention math; fp32
    scores where the einsum path rounds them to bf16.

    ``fused_block`` (None = auto: on for TPU; ignored with ``fold_ln``)
    runs each whole block — LN, QKV GEMM, attention, proj+residual, LN,
    MLP+residual — as ONE Pallas kernel over the pre-folded weights
    (``ops.fused_dit_block``): the residual stream is read/written once per
    block and every intermediate stays in VMEM. Subsumes ``pallas_attn``."""

    def apply(params: Any, x: Array, t: Array, *labels: Array) -> Array:
        p = params["params"]
        d, patch, cin = model.dim, model.patch, model.in_channels
        b, hh, ww, _ = x.shape
        if hh % patch or ww % patch:
            raise ValueError(f"img {hh}x{ww} not divisible by patch {patch}")
        gh, gw = hh // patch, ww // patch
        n_tok = gh * gw
        cdt = model.dtype or jnp.result_type(x)

        def dense(v, dp, dt=cdt):
            return (v.astype(dt) @ dp["kernel"].astype(dt)
                    + dp["bias"].astype(dt))

        # conditioning vector (1, D): time + summed batch-constant labels
        t1 = _batch1("t", t)
        te = p["TimeEmbedding_0"]
        c = dense(nn.silu(dense(sinusoidal_embedding(t1, d), te["Dense_0"])),
                  te["Dense_1"])
        if model.num_classes:
            assert len(labels) == len(model.num_classes), (
                f"model takes {len(model.num_classes)} label slots, "
                f"got {len(labels)}")
            for i in range(len(model.num_classes)):
                lab = _batch1(f"label {i}", labels[i])
                emb = p[f"label_emb_{i}"]["embedding"].astype(cdt)
                c = c + emb[lab]
        sc = nn.silu(c)

        # patchify as GEMM: (B, N, p*p*C) x (p*p*C, D); kernel flattening
        # order (ph, pw, C) matches nn.Conv's (h, w, cin, cout) layout
        w_pat = p["patchify"]["kernel"].reshape(patch * patch * cin, d)
        xp = x.astype(cdt).reshape(b, gh, patch, gw, patch, cin)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_tok,
                                                    patch * patch * cin)
        tok = (xp @ w_pat.astype(cdt) + p["patchify"]["bias"].astype(cdt)
               + p["pos_emb"].astype(cdt))

        def ln_gemm(h, w_f, b_f):
            """LN(h) @ w_f + b_f — normalize materialized, or folded into
            the GEMM epilogue (fold_ln; see factory docstring)."""
            if not fold_ln:
                return _ln_nostats_fp32(h) @ w_f + b_f
            hf = h.astype(jnp.float32)
            mu = hf.mean(axis=-1, keepdims=True)
            var = jnp.maximum(0.0, (hf * hf).mean(axis=-1, keepdims=True)
                              - mu * mu)
            inv = jax.lax.rsqrt(var + 1e-6)
            # GEMM on the RAW residual stream, fp32 accumulate (MXU native)
            g = jnp.einsum("bnd,de->bne", h, w_f,
                           preferred_element_type=jnp.float32)
            s = jnp.sum(w_f.astype(jnp.float32), axis=0)  # per-step const
            y = (g - mu * s) * inv
            return y.astype(h.dtype) + b_f

        n_heads = model.n_heads
        for i in range(model.depth):
            bp = p[f"block_{i}"]
            mod = dense(sc, bp["Dense_0"])[0]  # (6D,) per-step constants
            (sa_shift, sa_scale, sa_gate,
             m_shift, m_scale, m_gate) = jnp.split(mod, 6)

            # per-step folded weights: modulation into the input GEMMs,
            # gates into the output GEMMs (O(D^2)/step — module comment)
            w_qkv, b_qkv, w_pr, b_pr = _attn_kernels(bp, d)
            w_qkv, b_qkv = w_qkv.astype(cdt), b_qkv.astype(cdt)
            w_pr, b_pr = w_pr.astype(cdt), b_pr.astype(cdt)
            w1 = bp["Dense_1"]["kernel"].astype(cdt)
            b1 = bp["Dense_1"]["bias"].astype(cdt)
            w2 = bp["Dense_2"]["kernel"].astype(cdt)
            b2 = bp["Dense_2"]["bias"].astype(cdt)
            w_qkv_f = w_qkv * (1.0 + sa_scale)[:, None]
            b_qkv_f = b_qkv + sa_shift @ w_qkv
            w_pr_f, b_pr_f = w_pr * sa_gate[None, :], b_pr * sa_gate
            w1_f = w1 * (1.0 + m_scale)[:, None]
            b1_f = b1 + m_shift @ w1
            w2_f, b2_f = w2 * m_gate[None, :], b2 * m_gate

            if not fold_ln and fused_block is not False:
                tok = fused_dit_block(
                    tok, w_qkv_f, b_qkv_f, w_pr_f, b_pr_f, w1_f, b1_f,
                    w2_f, b2_f, n_heads, use_pallas=fused_block,
                    attn_mode=attn_mode)
                continue

            qkv = ln_gemm(tok, w_qkv_f, b_qkv_f)
            o = short_seq_attention(qkv, n_heads, use_pallas=pallas_attn)
            tok = tok + (o @ w_pr_f + b_pr_f)
            h = nn.gelu(ln_gemm(tok, w1_f, b1_f))
            tok = tok + (h @ w2_f + b2_f)

        # final adaLN folded into the fp32 unpatchify head
        fmod = dense(sc, p["final_mod"])[0].astype(jnp.float32)
        f_shift, f_scale = jnp.split(fmod, 2)
        w_u = p["unpatchify"]["kernel"].astype(jnp.float32)
        out = (_ln_nostats_fp32(tok).astype(jnp.float32)
               @ (w_u * (1.0 + f_scale)[:, None])
               + (p["unpatchify"]["bias"].astype(jnp.float32)
                  + f_shift @ w_u))
        out = out.reshape(b, gh, gw, patch, patch, cin)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cin)

    return apply
