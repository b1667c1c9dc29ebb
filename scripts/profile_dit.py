#!/usr/bin/env python
"""Per-op profile of the DiT headline flagship (patch 7 / dim 256 / depth 8).

The r3 quality gate made this config the headline bench model (1251 img/s,
artifacts/quality_gate_r3/) but its MFU is only ~0.20 — DESIGN.md §3.1's
hypothesis is that at 16 tokens the adaLN/LayerNorm elementwise passes and
the head_dim-32 attention layouts dominate, not the GEMMs. This script
measures that claim per-op and A/B-compares the stock flax
MultiHeadDotProductAttention path against models.dit.FusedQKVAttention
(one QKV GEMM, full-width projections) at the bench's exact shapes.

Same measurement discipline as profile_unet.py (N reps fused in one jitted
lax.scan, full-tensor forcing, plausibility guard). The A/B rows alternate
variants inside one process so shared-tenancy drift hits both equally.

  python scripts/profile_dit.py --bs 768 --reps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import flax.linen as nn

from _common import (add_runtime_flags, apply_runtime_flags,
                     require_accelerator)
from profile_unet import timed_scan
from composable_diffusion_models_tpu import compose, experts, samplers
from composable_diffusion_models_tpu.models import DiT
from composable_diffusion_models_tpu.models.dit import (DiTBlock,
                                                        FusedQKVAttention,
                                                        make_folded_apply)
from composable_diffusion_models_tpu.schedules import VPSchedule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=768)
    ap.add_argument("--patch", type=int, default=7)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--img", type=int, default=28)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--experts", type=int, default=3)
    add_runtime_flags(ap)
    args, _ = ap.parse_known_args()
    apply_runtime_flags(args)
    if not args.cpu:
        require_accelerator()

    bs, d, img = args.bs, args.dim, args.img
    n_tok = (img // args.patch) ** 2
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rows = []

    def rand(shape):
        return jax.random.normal(key, shape, dt)

    # ---- full forwards: stock MHDPA / fused-qkv / FOLDED, A/B interleaved -
    x = rand((bs, img, img, 1))
    t = jnp.full((1,), 0.5, dt)
    variants = {}
    for fused in (False, True):
        model = DiT(patch=args.patch, dim=d, depth=args.depth,
                    n_heads=args.heads, in_channels=1, qkv_fused=fused,
                    dtype=dt)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt),
            model.init(key, jnp.zeros((1, img, img, 1)), jnp.ones((1,))))
        variants[fused] = (model, params)
    fwd_fns = {
        "stock MHDPA": (lambda xx: variants[False][0].apply(
            variants[False][1], xx, t)),
        "fused-qkv": (lambda xx: variants[True][0].apply(
            variants[True][1], xx, t)),
        # r4 serving path: adaLN folded into per-step GEMM weights,
        # patchify as GEMM (same param tree as fused-qkv)
        "FOLDED": (lambda xx, f=make_folded_apply(variants[True][0],
                                                  pallas_attn=False,
                                                  fused_block=False):
                   f(variants[True][1], xx, t)),
        # + LN normalization folded into the GEMM epilogue (raw-stream GEMM)
        "FOLD_LN": (lambda xx, f=make_folded_apply(variants[True][0],
                                                   fold_ln=True,
                                                   pallas_attn=False):
                    f(variants[True][1], xx, t)),
        # + fused scores/softmax/value Pallas kernel (the measured limiter:
        # attention internals ran 0.51 ms/block vs 0.05 ms GEMM-cost, r4)
        "PALLAS_ATTN": (lambda xx, f=make_folded_apply(variants[True][0],
                                                       pallas_attn=True,
                                                       fused_block=False):
                        f(variants[True][1], xx, t)),
        # + whole block (LN+QKV+attn+proj+LN+MLP+residuals) as ONE kernel
        "FUSED_BLOCK": (lambda xx, f=make_folded_apply(variants[True][0],
                                                       fused_block=True):
                        f(variants[True][1], xx, t)),
        # r5: in-kernel attention via dot_general batch dims per image —
        # exact score FLOPs / exp count, tiny per-image MXU shapes
        # (VERDICT r4 item 2a A/B)
        "BLOCK_BATCHED": (lambda xx, f=make_folded_apply(
                              variants[True][0], fused_block=True,
                              attn_mode="batched"):
                          f(variants[True][1], xx, t)),
    }
    for rep in range(2):  # interleave all variants per round
        for tag, fn in fwd_fns.items():
            sec = timed_scan(fn, (x,), args.reps)
            rows.append((f"DiT fwd ({tag}) r{rep}", sec, dit_flops(
                bs, n_tok, d, args.depth, args.heads)))

    # ---- per-op decomposition at the block's shapes -----------------------
    tok = rand((bs, n_tok, d))
    c = rand((bs, d))

    for fused in (False, True):
        blk = DiTBlock(d, args.heads, qkv_fused=fused, dtype=dt)
        bp = jax.tree_util.tree_map(
            lambda p: p.astype(dt), blk.init(key, tok, c))
        sec = timed_scan(lambda xx, b=blk, p=bp: b.apply(p, xx, c), (tok,),
                         args.reps)
        rows.append((f"DiTBlock ({'fused' if fused else 'stock'})", sec,
                     block_flops(bs, n_tok, d, args.heads)))

    # attention alone
    mh = nn.MultiHeadDotProductAttention(num_heads=args.heads, dtype=dt)
    mp = mh.init(key, tok, tok)
    sec = timed_scan(lambda xx: mh.apply(mp, xx, xx), (tok,), args.reps)
    rows.append(("attention (stock MHDPA)", sec,
                 attn_flops(bs, n_tok, d, args.heads)))
    fa = FusedQKVAttention(d, args.heads, dtype=dt)
    fp = fa.init(key, tok)
    sec = timed_scan(lambda xx: fa.apply(fp, xx), (tok,), args.reps)
    rows.append(("attention (fused qkv)", sec,
                 attn_flops(bs, n_tok, d, args.heads)))

    # MLP GEMM pair alone (the block's FLOP majority)
    d1 = nn.Dense(4 * d, dtype=dt)
    d2 = nn.Dense(d, dtype=dt)
    p1 = d1.init(key, tok)
    p2 = d2.init(key, rand((bs, n_tok, 4 * d)))
    sec = timed_scan(
        lambda xx: d2.apply(p2, nn.gelu(d1.apply(p1, xx))), (tok,),
        args.reps)
    rows.append(("MLP d->4d->d (+gelu)", sec,
                 2 * 2 * bs * n_tok * d * 4 * d))

    # LN(fp32) + modulate pass — the hypothesized bandwidth limiter
    shift = rand((bs, d))
    scale = rand((bs, d))
    ln = nn.LayerNorm(use_scale=False, use_bias=False, dtype=jnp.float32)
    lp = ln.init(key, tok)

    def ln_mod(xx):
        h = ln.apply(lp, xx).astype(xx.dtype)
        return h * (1.0 + scale[:, None, :]) + shift[:, None, :]

    sec = timed_scan(ln_mod, (tok,), args.reps)
    rows.append(("LN(fp32)+modulate pass", sec, None))

    # patchify conv + unpatchify-shaped GEMM
    pc = nn.Conv(d, (args.patch, args.patch),
                 strides=(args.patch, args.patch), padding="VALID", dtype=dt)
    pp = pc.init(key, x)
    sec = timed_scan(lambda xx: pc.apply(pp, xx), (x,), args.reps)
    rows.append(("patchify conv", sec,
                 2 * bs * n_tok * args.patch * args.patch * 1 * d))

    # ideal-GEMM ceiling probe: one matmul with the full forward's FLOPs
    fl_total = dit_flops(bs, n_tok, d, args.depth, args.heads)
    m = int(round((fl_total / 2 / 1024) ** 0.5))
    a = rand((m, 1024))
    b = rand((1024, m))
    sec = timed_scan(lambda aa: aa @ b, (a,), args.reps)
    rows.append((f"ideal GEMM {m}x1024x{m} (= fwd FLOPs)", sec,
                 2 * m * m * 1024))

    # ---- the decision number: full 50-step 3-expert DDIM ------------------
    # Variants x expert layout, INTERLEAVE-REPEATED (ADVICE r3: a single
    # sequential pass per variant is unreliable for diffs < ~15% on the
    # shared-tenancy chip — alternate compiled programs across outer rounds
    # and keep the per-variant BEST). Forcing: the jitted program returns
    # out.sum() (full-tensor dependency inside the program); the timed loop
    # collects async scalars and blocks once at the end — zero eager ops in
    # the timed window (ADVICE r3 item 4).
    schedule = VPSchedule()
    w3 = jnp.ones((args.experts,), jnp.float32)

    def build_sampler(model, apply_fn, unroll_below):
        params3 = [jax.tree_util.tree_map(
            lambda p: p.astype(dt),
            model.init(jax.random.fold_in(key, i),
                       jnp.zeros((1, img, img, 1)), jnp.ones((1,))))
            for i in range(args.experts)]
        stack = experts.ExpertStack(apply_fn, params3,
                                    unroll_below=unroll_below)

        def eps_fn(xx, tt):
            eps = stack(xx.astype(dt), tt.astype(dt))
            return compose.weighted(eps.astype(jnp.float32), w3)

        @jax.jit
        def sample(k):
            xi = jax.random.normal(k, (bs, img, img, 1), jnp.float32)
            return samplers.ddim(eps_fn, schedule, xi, 50).sum()

        return sample

    stock_model, fused_model = variants[False][0], variants[True][0]
    samplers_by_tag = {
        ("stock", "unroll"): build_sampler(stock_model, stock_model.apply, 5),
        ("fused", "unroll"): build_sampler(fused_model, fused_model.apply, 5),
        ("folded", "unroll"): build_sampler(
            fused_model, make_folded_apply(fused_model, pallas_attn=False,
                                           fused_block=False), 5),
        ("pallas", "unroll"): build_sampler(
            fused_model, make_folded_apply(fused_model, pallas_attn=True,
                                           fused_block=False), 5),
        ("block", "unroll"): build_sampler(
            fused_model, make_folded_apply(fused_model, fused_block=True),
            5),
        ("blkbat", "unroll"): build_sampler(
            fused_model, make_folded_apply(fused_model, fused_block=True,
                                           attn_mode="batched"), 5),
    }
    for tag, sample in samplers_by_tag.items():  # compile+warm all first
        float(sample(key))
    reps_by_tag = {tag: [] for tag in samplers_by_tag}
    for rnd in range(3):
        for tag, sample in samplers_by_tag.items():
            t0 = time.perf_counter()
            outs = [sample(jax.random.fold_in(key, 7 * rnd + i))
                    for i in range(3)]
            float(jnp.stack(outs).sum())
            v = bs * 3 / (time.perf_counter() - t0)
            reps_by_tag[tag].append(v)
            print(f"  round {rnd} {tag}: {v:.1f} img/s")
    ips = {tag: max(v) for tag, v in reps_by_tag.items()}

    # ---- table ------------------------------------------------------------
    print(f"\nbs={bs} patch={args.patch} dim={d} depth={args.depth} "
          f"heads={args.heads} tokens={n_tok} reps={args.reps} "
          f"device={jax.devices()[0]}")
    print("\n| op | ms | TF/s |")
    print("|---|---|---|")
    for name, sec, fl in rows:
        tf = f"{fl / sec / 1e12:.1f}" if fl else "-"
        if fl and fl / sec / 1e12 > 200.0:
            tf += " IMPLAUSIBLE(>peak)"
        print(f"| {name} | {sec * 1e3:.3f} | {tf} |")
    print("\nfull 50-step DDIM 3-expert (img/s; mean +- halfspread over "
          "interleaved rounds, best in brackets):")
    means = {}
    for tag, reps in sorted(reps_by_tag.items()):
        mean = sum(reps) / len(reps)
        spread = (max(reps) - min(reps)) / 2
        means[tag] = mean
        print(f"  attn={tag[0]:6s} experts={tag[1]:6s}: "
              f"{mean:.1f} +- {spread:.1f}  [best {max(reps):.1f}]  "
              f"reps={[round(r, 1) for r in reps]}")
    # pairwise mean diffs vs the measured-best variant — a default flip
    # needs |diff| comfortably above both variants' spreads (CLAUDE.md:
    # believe nothing under ~15% without interleaving, which this is)
    best_tag = max(means, key=means.get)
    for tag in sorted(means):
        if tag != best_tag:
            d = means[best_tag] - means[tag]
            print(f"  {best_tag} vs {tag}: mean diff {d:+.1f} img/s "
                  f"({100 * d / means[tag]:+.1f}%)")


def attn_flops(b, t, d, h):
    # qkv + out projections dominate; score/value matmuls are 2*2*b*h*t*t*hd
    return 2 * b * t * d * 4 * d + 2 * 2 * b * t * t * d


def block_flops(b, t, d, h):
    return attn_flops(b, t, d, h) + 2 * 2 * b * t * d * 4 * d + 2 * b * d * 6 * d


def dit_flops(b, t, d, depth, h):
    return depth * block_flops(b, t, d, h)


if __name__ == "__main__":
    main()
