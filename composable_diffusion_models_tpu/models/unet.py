"""Parameterized score UNet — the single net covering the reference's UNet zoo.

One Flax module replaces (SURVEY.md §2.2):
  * M1 `UNet` uncond 28x28        /root/reference/mnist/models/unet_small.py:47-92
  * M2 class-conditional variant   /root/reference/shapes/models/unet_small.py:53-120
  * M4 `SimpleUnet` (src family)   /root/reference/src/composing_conditional_diffusion_on_shape_and_color.py:107-199
  * M5 `ColoredMNISTScoreModel`    /root/reference/src/composing_colored_mnist.py:98-136
  * M6 `GuidedUNet`/cross-attn     /root/reference/src/compositional_diffusion_with_cross_attention.py:86-208
selected by (channel_mults, label slots, null_token, cross_attn) flags.

TPU-first design decisions:
  * NHWC layout end-to-end (XLA's native conv layout on TPU — keeps the MXU fed
    without transposes).
  * bilinear ``jax.image.resize`` up-path (parity with nn.Upsample bilinear,
    align_corners handled below) and 2x2 max-pool down-path.
  * GroupNorm(8) everywhere (the reference's BatchNorm variants are folded in:
    GN is the TPU-friendly, batch-size-independent choice).
  * cross-attention runs over HW query tokens x <=2 context tokens — tiny KV,
    expressed as two einsums that XLA fuses; a Pallas variant lives in
    ops/attention.py for larger contexts.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import pallas_kernels as pk
from .embeddings import TimeEmbedding

Array = jax.Array


def _upsample2x(x: Array) -> Array:
    """Bilinear 2x upsample, NHWC.

    The reference uses align_corners=True (mnist/models/unet_small.py:73);
    jax.image.resize('linear') matches align_corners=False half-pixel centers.
    For even 2x scale on these tiny maps the difference is sub-pixel and does
    not change behavior of trained-from-scratch nets; we standardize on the
    XLA-fusable resize.
    """
    b, h, w, c = x.shape
    # same values as jax.image.resize(..., "linear"), but expressed as two
    # small matmuls so the op lands on the MXU instead of the gather units
    # (the interp matrices are built BY resize on an identity, then
    # constant-folded by XLA — exact equivalence by linearity)
    mh = jax.image.resize(jnp.eye(h, dtype=jnp.float32), (2 * h, h), "linear")
    mw = jax.image.resize(jnp.eye(w, dtype=jnp.float32), (2 * w, w), "linear")
    y = jnp.einsum("Hh,bhwc->bHwc", mh.astype(x.dtype), x)
    return jnp.einsum("Ww,bhwc->bhWc", mw.astype(x.dtype), y)


def _maxpool2x(x: Array) -> Array:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def _gn_groups(channels: int, preferred: int = 8) -> int:
    """Largest group count <= preferred that divides the channel count
    (the reference hard-codes GN(8); tiny test widths need fewer)."""
    for g in (preferred, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class GNSiLU(nn.Module):
    """GroupNorm + SiLU with an optional fused Pallas kernel (TPU).

    Param layout ({scale, bias}) is identical in both paths, so checkpoints
    are interchangeable; the fallback path matches flax GroupNorm + silu
    exactly (tested in tests/test_pallas_kernels.py). A tuple input is
    normalized as if concatenated on channels — without materializing the
    concat (pk.groupnorm_silu_split) — and returned as a tuple.
    """

    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        xs = x if isinstance(x, (tuple, list)) else None
        c = sum(p.shape[-1] for p in xs) if xs else x.shape[-1]
        groups = _gn_groups(c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if xs:
            outs = pk.groupnorm_silu_split(xs, scale, bias, groups=groups)
            return tuple(o.astype(self.dtype or o.dtype) for o in outs)
        out = pk.groupnorm_silu(x, scale, bias, groups=groups,
                                use_pallas=self.use_pallas)
        return out.astype(self.dtype or x.dtype)


class _SplitConv(nn.Module):
    """nn.Conv-compatible conv over a tuple of inputs treated as one
    channel-concatenated tensor: conv(concat(parts), W) == sum_i conv(part_i,
    W[..., off_i:off_i+c_i, :]) by linearity. Same param tree as nn.Conv
    ({kernel, bias}, lecun_normal/zeros, fp32 params), so checkpoints are
    interchangeable with the concat formulation."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, parts) -> Array:
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.kernel_size + (cin, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.astype(self.dtype or parts[0].dtype)
        out, off = None, 0
        for p in parts:
            cc = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(k.dtype), k[..., off:off + cc, :], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
            off += cc
        return out + bias.astype(out.dtype)


class ResBlock(nn.Module):
    """GN(8)+SiLU+3x3conv -> +time proj -> GN+SiLU+dropout+3x3conv -> +residual.

    Mirrors /root/reference/mnist/models/unet_small.py:22-44. ``dtype`` is the
    COMPUTE dtype (bf16 on TPU keeps the convs on the MXU's fast path — flax
    norms otherwise silently upcast everything downstream to fp32); params
    stay in ``param_dtype``.
    """

    out_channels: int
    dropout: float = 0.1
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, t_emb: Array, *, skip: Optional[Array] = None,
                 train: bool = False) -> Array:
        """``skip`` is treated exactly as concat([x, skip], -1) input, but the
        concat is never materialized (profiled ~6% of the DDIM step): GN stats
        combine from per-part channel sums and the convs split their kernels
        by linearity. Param tree is identical to the concat formulation."""
        parts = (x,) if skip is None else (x, skip)
        in_ch = sum(p.shape[-1] for p in parts)
        hn = GNSiLU(self.dtype, self.use_pallas, name="gn1")(
            parts if skip is not None else x)
        if skip is None:
            h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name="Conv_0")(hn)
        else:
            h = _SplitConv(self.out_channels, (3, 3), dtype=self.dtype,
                           name="Conv_0")(hn)
        # time conditioning, broadcast over H, W
        temb = nn.Dense(self.out_channels, dtype=self.dtype,
                        name="Dense_0")(nn.silu(t_emb))
        h = h + temb[:, None, None, :]
        h = GNSiLU(self.dtype, self.use_pallas, name="gn2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="Conv_1")(h)
        if in_ch != self.out_channels:
            if skip is None:
                res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                              name="Conv_2")(x)
            else:
                res = _SplitConv(self.out_channels, (1, 1), dtype=self.dtype,
                                 name="Conv_2")(parts)
        else:
            assert skip is None, "skip input requires a channel-changing block"
            res = x
        return h + res


class _OutHead(nn.Module):
    """1x1 output conv with fp32 MXU accumulation over a bf16 input.

    Param tree is identical to ``nn.Conv(features, (1, 1))`` ({kernel, bias},
    lecun_normal/zeros, fp32) so checkpoints are interchangeable. The previous
    formulation upcast the full (B, H, W, C) activation to fp32 before a
    fp32 conv — materializing an extra fp32 copy of the widest tensor every
    forward (~6% of the DDIM step at B=384, measured). bf16 inputs with
    ``preferred_element_type=float32`` accumulate on the MXU in fp32, which
    is the same numerics that matter for a clean eps head (the inputs were
    already bf16); with an fp32 compute dtype the path is exactly the conv.
    """

    features: int

    @nn.compact
    def __call__(self, h: Array) -> Array:
        cin = h.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        w = kernel[0, 0].astype(h.dtype)
        y = jax.lax.dot_general(h, w, (((h.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + bias


class CrossAttention(nn.Module):
    """Multi-head cross-attention from HW image tokens to a tiny label context.

    Behavioral equivalent of the reference's UNetBlock attention
    (/root/reference/src/compositional_diffusion_with_cross_attention.py:86-141):
    LayerNorm'd residual attention where K/V come from 1-2 context tokens.
    """

    num_heads: int = 4
    dtype: Any = None
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        tokens = x.reshape(b, h * w, c)
        tokens_n = nn.LayerNorm(dtype=self.dtype)(tokens)
        q = nn.Dense(c, use_bias=False, dtype=self.dtype)(tokens_n)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype)(context)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype)(context)

        def split(z):
            return z.reshape(z.shape[0], z.shape[1], self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.use_flash:
            # Pallas blockwise kernel (ops/attention.py) over (B, H, N, D):
            # same math, O(block) memory — the long-context path (big images
            # or real text conditioning; at the reference's <=2-token context
            # the einsum pair below is already optimal)
            from ..ops.attention import flash_attention
            out = flash_attention(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3))
            out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(head_dim, jnp.float32))
            attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype)(out)
        return x + out.reshape(b, h, w, c)


class UNet(nn.Module):
    """Score network predicting eps_hat(x_t, t [, labels...]).

    Args cover the whole reference zoo:
      in_channels:    1 (MNIST/grayscale shapes) or 3 (RGB).
      base_dim:       initial width (64 in mnist/shapes; 32 in M5).
      channel_mults:  per-level multipliers; last entry is the bottleneck.
                      (1, 2, 4) == reference small UNet;
                      (1, 2, 4, 8, 16) == src SimpleUnet depth.
      num_classes:    sizes of label slots, e.g. () uncond, (3,) shapes,
                      (3, 3) shape+color, (10, 10) digit+color.
      null_token:     reserve one extra embedding row per slot for CFG
                      (pass label == num_classes[i] for "uncond").
      cross_attn:     attend HW tokens to label-embedding context instead of
                      adding labels into the time embedding (GuidedUNet).
      flash_attn:     route the cross-attention through the Pallas blockwise
                      flash kernel (ops/attention.py) — identical math and
                      params, O(block) memory for long contexts.
      pad_to:         compute on a zero-padded square canvas of this size and
                      crop the output back (TPU perf: 28x28 inputs leave the
                      bottleneck at 7x7, which pads to 8 sublane rows with
                      ~12% tile waste and keeps every spatial dim 8-unaligned;
                      a 32x32 canvas makes all three levels 8-aligned
                      (32/16/8) for the conv emitter). Param tree is
                      unchanged — checkpoints are interchangeable with the
                      unpadded model, though activations (GN stats include
                      the pad band) differ, so train and sample with the
                      same setting.
    """

    in_channels: int = 1
    base_dim: int = 64
    channel_mults: Sequence[int] = (1, 2, 4)
    time_emb_dim: int = 256
    num_classes: Sequence[int] = ()
    null_token: bool = False
    dropout: float = 0.1
    cross_attn: bool = False
    flash_attn: bool = False
    attn_heads: int = 4
    out_channels: Optional[int] = None
    dtype: Any = None
    use_pallas: bool = False
    pad_to: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, t: Array, *labels: Array,
                 train: bool = False) -> Array:
        assert x.ndim == 4, "expected NHWC input"
        orig_hw = x.shape[1:3]
        if self.pad_to and orig_hw != (self.pad_to, self.pad_to):
            ph, pw = self.pad_to - orig_hw[0], self.pad_to - orig_hw[1]
            assert ph >= 0 and pw >= 0, "pad_to smaller than the input"
            # center the content on the canvas (digits stay centered)
            pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                    (0, 0))
            x = jnp.pad(x, pads)
        t = jnp.asarray(t)
        if t.ndim == 0:
            # batch-constant t (the samplers' scan bodies pass a scalar):
            # compute the whole time-MLP tower at batch 1 and let the
            # (1, C) + (B, H, W, C) broadcast do the rest — the per-step
            # embedding work becomes batch-size independent
            t = t[None]
        t_emb = TimeEmbedding(self.base_dim, self.time_emb_dim,
                              dtype=self.dtype)(t)

        context = None
        if self.num_classes:
            assert len(labels) == len(self.num_classes), (
                f"model takes {len(self.num_classes)} label slots, got {len(labels)}")
            embs = []
            for i, n in enumerate(self.num_classes):
                vocab = n + (1 if self.null_token else 0)
                embs.append(nn.Embed(vocab, self.time_emb_dim,
                                     dtype=self.dtype,
                                     name=f"label_emb_{i}")(labels[i]))
            if self.cross_attn:
                context = jnp.stack(embs, axis=1)  # (B, n_slots, emb)
            else:
                # reference adds label embedding(s) into the time embedding
                # (shapes/models/unet_small.py:99-103)
                t_emb = t_emb + sum(embs)

        n_levels = len(self.channel_mults) - 1
        h = nn.Conv(self.base_dim * self.channel_mults[0], (3, 3),
                    padding="SAME", dtype=self.dtype, name="init_conv")(x)

        skips = []
        for i in range(n_levels):
            h = ResBlock(self.base_dim * self.channel_mults[i],
                         self.dropout, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         name=f"down_{i}")(h, t_emb, train=train)
            if self.cross_attn and context is not None:
                h = CrossAttention(self.attn_heads, dtype=self.dtype,
                                   use_flash=self.flash_attn,
                                   name=f"down_attn_{i}")(h, context)
            skips.append(h)
            h = _maxpool2x(h)

        h = ResBlock(self.base_dim * self.channel_mults[-1],
                     self.dropout, dtype=self.dtype,
                     use_pallas=self.use_pallas,
                     name="bottleneck")(h, t_emb, train=train)
        if self.cross_attn and context is not None:
            h = CrossAttention(self.attn_heads, dtype=self.dtype,
                               use_flash=self.flash_attn,
                               name="bot_attn")(h, context)

        for i in reversed(range(n_levels)):
            h = _upsample2x(h)
            h = ResBlock(self.base_dim * self.channel_mults[i],
                         self.dropout, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         name=f"up_{i}")(h, t_emb, skip=skips[i], train=train)
            if self.cross_attn and context is not None:
                h = CrossAttention(self.attn_heads, dtype=self.dtype,
                                   use_flash=self.flash_attn,
                                   name=f"up_attn_{i}")(h, context)

        out_ch = self.out_channels or self.in_channels
        # output head: fp32 accumulation without an fp32 activation copy
        out = _OutHead(out_ch, name="out_conv")(h)
        if self.pad_to and orig_hw != (self.pad_to, self.pad_to):
            ph, pw = self.pad_to - orig_hw[0], self.pad_to - orig_hw[1]
            out = out[:, ph // 2:ph // 2 + orig_hw[0],
                      pw // 2:pw // 2 + orig_hw[1], :]
        return out
