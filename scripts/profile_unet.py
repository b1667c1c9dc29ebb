#!/usr/bin/env python
"""Per-op profile of the flagship DDIM benchmark step (VERDICT r1 next-3).

Times each UNet component standalone at the bench's exact shapes and prints
a markdown table (op, ms, TF/s, % of full eps step) to paste into DESIGN.md.

Measurement discipline (CLAUDE.md): every number comes from N repetitions
fused inside ONE jitted lax.scan (the tunneled runtime costs ~25 ms fixed
per dispatch), forced with a full-tensor dependency; rows whose implied TF/s
exceeds the chip's bf16 peak are flagged IMPLAUSIBLE in the table. Caveat:
rows are timed back-to-back per op (not A/B-interleaved across ops), so
same-program warm-call inflation is possible — trust the table's structure
over small absolute diffs, and re-run before believing any <15% delta.

  python scripts/profile_unet.py --bs 384 --reps 100
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from _common import (add_runtime_flags, apply_runtime_flags,
                     require_accelerator)
from composable_diffusion_models_tpu import compose, experts, samplers
from composable_diffusion_models_tpu.models import UNet
from composable_diffusion_models_tpu.models.unet import (GNSiLU, ResBlock,
                                                         _upsample2x)
from composable_diffusion_models_tpu.schedules import VPSchedule


def timed_scan(fn, args, reps, dtype=jnp.bfloat16):
    """Seconds per call of fn(*args): reps fused in one jitted scan, result
    forced through a full-tensor sum. The carry perturbs the input each
    iteration so XLA cannot CSE the loop body away."""

    @jax.jit
    def run(*xs):
        def body(carry, _):
            out = fn(*( (xs[0] + carry,) + xs[1:] ))
            return carry + out.sum().astype(carry.dtype) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=reps)
        return c

    float(run(*args))  # compile + warm the EXACT program
    t0 = time.perf_counter()
    float(run(*args))
    dt = time.perf_counter() - t0
    return dt / reps


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * k * k * cin * cout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=384)
    ap.add_argument("--base_dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--img", type=int, default=28)
    ap.add_argument("--in_ch", type=int, default=1,
                    help="3 + --img 64 profiles the shapes-64 secondary "
                         "bench workload (VERDICT r2 #4)")
    ap.add_argument("--experts", type=int, default=3)
    add_runtime_flags(ap)
    args, _ = ap.parse_known_args()
    apply_runtime_flags(args)
    if not args.cpu:
        require_accelerator()

    bs, bd, img = args.bs, args.base_dim, args.img
    cin0, n_exp = args.in_ch, args.experts
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rows = []  # (name, sec, flops)

    model = UNet(in_channels=cin0, base_dim=bd, channel_mults=(1, 2, 4),
                 dtype=dt)
    x0 = jnp.zeros((1, img, img, cin0))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt), model.init(key, x0, jnp.ones((1,))))

    # ---- full eps forward (1 expert) + full 3-expert blend ---------------
    x = jax.random.normal(key, (bs, img, img, cin0), dt)
    t = jnp.full((1,), 0.5, dt)
    sec_fwd = timed_scan(lambda xx: model.apply(params, xx, t), (x,),
                         args.reps)
    rows.append(("UNet forward (1 expert)", sec_fwd, None))

    params3 = [jax.tree_util.tree_map(
        lambda p: p.astype(dt),
        model.init(jax.random.fold_in(key, i), x0, jnp.ones((1,))))
        for i in range(n_exp)]
    stack = experts.ExpertStack(model.apply, params3)
    w3 = jnp.ones((n_exp,), jnp.float32)
    sec_3x = timed_scan(
        lambda xx: compose.weighted(stack(xx, t).astype(jnp.float32), w3)
        .astype(dt), (x,), args.reps)
    rows.append((f"{n_exp}-expert blended eps", sec_3x, None))

    # ---- components at the step's actual shapes --------------------------
    h1 = img, img, bd          # level 0
    h2 = img // 2, img // 2, bd
    h3 = img // 4, img // 4, 2 * bd

    def rand(shape):
        return jax.random.normal(key, (bs,) + shape, dt)

    # init conv 1 -> 64
    import flax.linen as nn
    conv = nn.Conv(bd, (3, 3), padding="SAME", dtype=dt)
    cp = conv.init(key, rand((img, img, cin0)))
    sec = timed_scan(lambda xx: conv.apply(cp, xx),
                     (rand((img, img, cin0)),), args.reps)
    rows.append((f"init conv {cin0}->{bd} @{img}", sec,
                 conv_flops(bs, img, img, cin0, bd)))

    # representative convs
    for (name, hh, cin, cout) in [
        (f"conv {bd}->{bd} @{img}", img, bd, bd),
        (f"conv {bd}->{2*bd} @{img//2}", img // 2, bd, 2 * bd),
        (f"conv {2*bd}->{4*bd} @{img//4}", img // 4, 2 * bd, 4 * bd),
        (f"conv {4*bd}->{4*bd} @{img//4}", img // 4, 4 * bd, 4 * bd),
    ]:
        c = nn.Conv(cout, (3, 3), padding="SAME", dtype=dt)
        cp = c.init(key, rand((hh, hh, cin)))
        sec = timed_scan(lambda xx, c=c, cp=cp: c.apply(cp, xx),
                         (rand((hh, hh, cin)),), args.reps)
        rows.append((name, sec, conv_flops(bs, hh, hh, cin, cout)))

    # GN+SiLU at the widest shape
    gn = GNSiLU(dtype=dt)
    gp = gn.init(key, rand(h1))
    sec = timed_scan(lambda xx: gn.apply(gp, xx), (rand(h1),), args.reps)
    rows.append((f"GN+SiLU {bd} @{img}", sec, None))

    # ---- ceiling probes: what does the emitter sustain at the sampler's
    # dominant shape, bare vs with the pre-norm pass interleaved? Round 1
    # measured bare chained conv 64->64 @28 at ~158 TF/s — ABOVE the naive
    # "half-lane at C_out=64" ceiling of 98.5, so the end-to-end limiter is
    # the GN bandwidth passes between convs, not MXU lane occupancy. These
    # two rows pin both rates in one run so the gap is measured, not argued.
    cbare = nn.Conv(bd, (3, 3), padding="SAME", dtype=dt)
    cbp = cbare.init(key, rand((img, img, bd)))
    sec = timed_scan(
        lambda xx: cbare.apply(cbp, cbare.apply(cbp, xx)),
        (rand((img, img, bd)),), args.reps)
    rows.append((f"conv2x bare {bd}->{bd} @{img}", sec,
                 2 * conv_flops(bs, img, img, bd, bd)))
    sec = timed_scan(
        lambda xx: cbare.apply(cbp, gn.apply(gp, cbare.apply(cbp, xx))),
        (rand((img, img, bd)),), args.reps)
    rows.append((f"conv2x + GN between @{img}", sec,
                 2 * conv_flops(bs, img, img, bd, bd)))

    # resblocks (standalone, matching down path)
    t_emb = jax.random.normal(key, (1, 256), dt)
    for (name, hh, cin, cout) in [
        (f"ResBlock {bd}->{bd} @{img}", img, bd, bd),
        (f"ResBlock {bd}->{2*bd} @{img//2}", img // 2, bd, 2 * bd),
        (f"ResBlock {2*bd}->{4*bd} @{img//4}", img // 4, 2 * bd, 4 * bd),
    ]:
        rb = ResBlock(cout, dtype=dt)
        rp = jax.tree_util.tree_map(
            lambda p: p.astype(dt), rb.init(key, rand((hh, hh, cin)), t_emb))
        sec = timed_scan(lambda xx, rb=rb, rp=rp: rb.apply(rp, xx, t_emb),
                         (rand((hh, hh, cin)),), args.reps)
        fl = conv_flops(bs, hh, hh, cin, cout) + conv_flops(bs, hh, hh, cout, cout)
        rows.append((name, sec, fl))

    # upsample matmuls
    sec = timed_scan(_upsample2x, (rand((img // 4, img // 4, 4 * bd)),),
                     args.reps)
    rows.append((f"upsample {img//4}->{img//2} @{4*bd}", sec, None))
    sec = timed_scan(_upsample2x, (rand((img // 2, img // 2, 2 * bd)),),
                     args.reps)
    rows.append((f"upsample {img//2}->{img} @{2*bd}", sec, None))

    # full 50-step DDIM sample / image throughput cross-check
    schedule = VPSchedule()

    def eps_fn(xx, tt):
        eps = stack(xx.astype(dt), tt.astype(dt))
        return compose.weighted(eps.astype(jnp.float32), w3)

    @jax.jit
    def sample(k):
        xi = jax.random.normal(k, (bs, img, img, cin0), jnp.float32)
        return samplers.ddim(eps_fn, schedule, xi, 50)

    float(sample(key).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(3):
        acc = acc + sample(jax.random.fold_in(key, i)).ravel()[0]
    float(acc)
    sec_sample = (time.perf_counter() - t0) / 3
    rows.append(("full 50-step DDIM batch", sec_sample, None))

    # ---- table -----------------------------------------------------------
    step_sec = sec_3x  # one composed eps evaluation = the DDIM step's compute
    print(f"\nbs={bs} base_dim={bd} img={img} in_ch={cin0} "
          f"experts={n_exp} reps={args.reps} device={jax.devices()[0]}")
    print(f"\n| op | ms | TF/s | % of {n_exp}-expert eps step |")
    print("|---|---|---|---|")
    for name, sec, fl in rows:
        tf = f"{fl / sec / 1e12:.1f}" if fl else "-"
        # physical-plausibility guard (CLAUDE.md measurement discipline):
        # every FLOP-bearing row here is a conv, and the calibrated conv
        # ceiling on this chip is ~150-190 TF/s — anything above 190 means
        # the measurement was corrupted (DCE'd body, or the timed call rode
        # a warm artifact), even if it is still below the 197 matmul peak
        if fl and fl / sec / 1e12 > 190.0:
            tf += " IMPLAUSIBLE(>conv-ceiling)"
        pct = f"{100 * sec / step_sec:.0f}%" if sec <= step_sec * 1.5 else "-"
        print(f"| {name} | {sec * 1e3:.2f} | {tf} | {pct} |")
    ips = bs / sec_sample
    print(f"\nfull-sample throughput: {ips:.1f} img/s "
          f"({50 * sec_3x * 1e3:.0f} ms implied eps work vs "
          f"{sec_sample * 1e3:.0f} ms measured batch)")


if __name__ == "__main__":
    main()
