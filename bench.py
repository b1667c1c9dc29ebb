#!/usr/bin/env python
"""Benchmark: MNIST 28x28 images/sec at 50-step DDIM with 3 composed experts,
one chip (BASELINE.json north star, target > 5000 img/s on TPU v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N/5000}

Workload parity: the reference composes K experts by running K sequential
PyTorch UNet forwards per step in a host loop (mnist/compose_scores.py:29-46).
Here the 3 experts are one vmapped stacked forward, the 50 DDIM steps are one
lax.scan, and the whole sampler is a single jitted program: zero host sync.

Flagship model: the metric is defined on the WORKLOAD (MNIST 28x28, 50-step
DDIM, 3 composed experts), not on the reference's architecture. The default
headline model is the r5 quality-gated DiT (patch 14 / dim 256 / depth 4 —
artifacts/quality_gate_r5: FAILs the self-judged gate at 24k train steps
but PASSes at 48k with composed in-union 0.9404 at n=1024 escalated
sampling; 4.4 GFLOP/image, 5.4x fewer FLOPs than the r4 flagship and 27x
fewer than the base-64 UNet; measured 15912 img/s at bs 8192, 3.2x the
5000 img/s north star). The reference-architecture number (M1
base-64 UNet, unet_small.py:47-92; bf16 params/activations, fp32 schedule
math) is still measured every run and reported as
extra.unet64_parity_images_per_sec; `--flagship unet64` restores it as the
headline.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from composable_diffusion_models_tpu import compose, experts, samplers
from composable_diffusion_models_tpu.models import UNet
from composable_diffusion_models_tpu.schedules import VPSchedule

BASELINE_IMGS_PER_SEC = 5000.0
# measured bf16 matmul peak on this chip (DESIGN.md §4 calibration)
CHIP_PEAK_TFLOPS = 197.0
# analytic forward cost of the reference mnist UNet (base 64, 28x28):
# counted conv/matmul MACs x2; DESIGN.md §2 roofline => 118.5 GFLOP per
# image per 50-step 3-expert DDIM sample (0.79 GFLOP/forward x 150)
MNIST_GFLOP_PER_IMAGE = 118.5


def gflop_per_image(base_dim: int, img_size: int, pad_to: int) -> float:
    """Analytic FLOPs/image for the bench workload at the given shape.

    Exact at the default (base 64 @ 28); other shapes scale the counted
    base quadratically in channel width and compute-canvas area (exact for
    every channel-scaled conv/matmul; the C_in=1 init conv scales linearly
    and contributes <2%, so implied_tflops/mfu at overridden shapes are
    approximate to that level — the headline metric is defined at the
    default shape)."""
    compute = pad_to or img_size
    return (MNIST_GFLOP_PER_IMAGE * (base_dim / 64.0) ** 2
            * (compute / 28.0) ** 2)


def build(batch_size: int, base_dim: int, dtype=jnp.bfloat16,
          use_pallas: bool = False, img_size: int = 28, pad_to: int = 0,
          n_steps: int = 50):
    key = jax.random.PRNGKey(0)
    # compute dtype bf16 end-to-end (flax modules cast params + activations;
    # without the model-level dtype the first GroupNorm silently upcasts the
    # whole net to fp32 and throughput drops ~2-4x)
    model = UNet(in_channels=1, base_dim=base_dim, channel_mults=(1, 2, 4),
                 dtype=dtype, use_pallas=use_pallas, pad_to=pad_to or None)
    x0 = jnp.zeros((1, img_size, img_size, 1))
    params_list = [
        jax.tree_util.tree_map(
            lambda p: p.astype(dtype),
            model.init(jax.random.fold_in(key, i), x0, jnp.ones((1,))))
        for i in range(3)
    ]
    stack = experts.ExpertStack(model.apply, params_list)
    schedule = VPSchedule()
    weights = jnp.ones((3,), jnp.float32)

    def eps_fn(x, t):
        eps = stack(x.astype(dtype), t.astype(dtype))
        return compose.weighted(eps.astype(jnp.float32), weights)

    @jax.jit
    def sample(key):
        x_init = jax.random.normal(key, (batch_size, img_size, img_size, 1),
                                   jnp.float32)
        return samplers.ddim(eps_fn, schedule, x_init, n_steps)

    return sample


def _timed_iters(sample, key, iters: int, warmups: int = 2) -> float:
    """Sustained-throughput timing through the tunnel: warm the EXACT
    program, then issue all batches back-to-back with distinct inputs and
    force at the end.

    ``sample`` must return a full-tensor-dependent SCALAR computed INSIDE
    the jitted program (out.sum() — DCE-safe because every output element
    feeds it). The loop only collects the async scalar handles: zero eager
    ops inside the timed window (an eager ravel()[0]+add per iteration
    dispatched ~3 extra tunneled ops each and inflated all absolute numbers
    ~10% at bs 768 — ADVICE r3). One eager stack().sum() fetch at the end
    blocks on every batch."""
    float(sample(key))
    for w in range(1, warmups):
        float(sample(jax.random.fold_in(key, w)))
    t0 = time.perf_counter()
    outs = [sample(jax.random.fold_in(key, 100 + i)) for i in range(iters)]
    float(jnp.stack(outs).sum())
    return (time.perf_counter() - t0) / iters


def run(batch_size: int, base_dim: int, iters: int = 5,
        use_pallas: bool = False, img_size: int = 28, pad_to: int = 0,
        n_steps: int = 50):
    sample = build(batch_size, base_dim, use_pallas=use_pallas,
                   img_size=img_size, pad_to=pad_to, n_steps=n_steps)
    per_batch = _timed_iters(
        jax.jit(lambda k: sample(k).sum()), jax.random.PRNGKey(1), iters)
    return batch_size / per_batch, per_batch


def measure_train_throughput(base_dim: int, batch_size: int = 256,
                             steps: int = 60) -> float:
    """Training images/sec for one expert (secondary metric, reported in
    "extra"): scan-fused chunks, donated buffers, synthetic data.

    Warms the EXACT jitted chunk it times (same `length`, same shapes) — a
    warmup with a different steps_per_scan is a different XLA program, and
    the timed call would silently include a full compile (this bug once made
    training look 40x slower than it is). bf16 compute / fp32 params+opt,
    the production mixed-precision recipe.
    """
    import optax
    from composable_diffusion_models_tpu import data, train

    key = jax.random.PRNGKey(0)
    model = UNet(in_channels=1, base_dim=base_dim, channel_mults=(1, 2, 4),
                 dtype=jnp.bfloat16)
    imgs, _ = data.synthetic_mnist(key, 2048)
    imgs = imgs * 2 - 1
    params = model.init(key, jnp.zeros((1, 28, 28, 1)), jnp.ones((1,)))
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)
    chunk = train.make_train_chunk(model.apply, VPSchedule(), tx,
                                   batch_size=batch_size)
    # warm/compile, then time steady-state chunks of the same program
    params, opt_state, warm_losses = chunk(params, opt_state, key, imgs,
                                           length=steps)
    float(warm_losses.sum())  # block: the timed call must start from idle
    t0 = time.perf_counter()
    params, opt_state, losses = chunk(params, opt_state,
                                      jax.random.fold_in(key, 1), imgs,
                                      length=steps)
    float(losses.sum())
    dt = time.perf_counter() - t0
    return steps * batch_size / dt


def dit_gflop_per_image(img_size: int = 28, patch: int = 4, dim: int = 512,
                        depth: int = 4, n_experts: int = 3,
                        n_steps: int = 50) -> float:
    """Analytic FLOPs/image for the DiT flagship composer on the bench
    workload (counted matmul MACs x2, same convention as the UNet count):
    per block qkv+out 4ND^2 + attention 2N^2D + MLP 8ND^2 + modulation 6D^2,
    plus patchify/unpatchify GEMMs."""
    n_tok = (img_size // patch) ** 2
    per_block = 12 * n_tok * dim * dim + 2 * n_tok * n_tok * dim \
        + 6 * dim * dim
    patchify = 2 * n_tok * dim * patch * patch  # in and out projections
    fwd_macs = depth * per_block + patchify
    return 2.0 * fwd_macs * n_experts * n_steps / 1e9


def measure_dit_throughput(batch_size: int = 384, iters: int = 3,
                           dim: int = 512, depth: int = 4,
                           n_steps: int = 50, patch: int = 4,
                           qkv_fused: bool = False,
                           folded: bool = False,
                           fold_ln: bool = False,
                           pallas_attn: bool | None = None,
                           fused_block: bool | None = None,
                           n_heads: int = 8) -> float:
    """DiT composer throughput on the bench workload — MNIST 28x28,
    50-step DDIM, 3 composed experts. Used twice:

    - the HEADLINE flagship (r5: patch 14 / dim 256 / depth 4 at bs 8192,
      15912 img/s, MFU 0.354 — depth 6 measures 11075 at bs 4096, MFU
      0.366; history below is the r3 p7/d256/l8 era —
      kept because the per-shape observations still hold at 16 tokens):
      (patch 7 / dim 256 / depth 8) passed the r3
      quality gate (artifacts/quality_gate_r3 — composed in-union 0.957,
      exactly the base-64 UNet's, with better solo quality at 3.7x fewer
      FLOPs). Measured 1213 img/s at bs 1024 stock (sweep 512/1024/2048;
      2048 is worse); 1295 img/s at bs 768 with qkv_fused=True (the bs-768
      A/B in /tmp-queue job1, archived in DESIGN.md §3). MFU is only ~0.20:
      at 16 tokens the GEMMs are tiny and the adaLN/LayerNorm elementwise
      passes dominate — kernel headroom, not a model ceiling (roofline 6.2k
      img/s at chip peak).
    - the r2 eval flagship (patch 4 / dim 512 / depth 4, "extra" row):
      ~471 img/s at 45% MFU (batch sweep 256/384/512/768/1024 — 256 and
      384 tie, larger is WORSE). At 49 tokens the per-head attention GEMMs
      (49x64x49) keep it at MFU comparable to the UNet's 49% — the
      hypothesis that LayerNorm-into-GEMM fusion would beat the UNet's
      GroupNorm HBM passes is REFUTED at this resolution."""
    from composable_diffusion_models_tpu.models import DiT, make_folded_apply

    key = jax.random.PRNGKey(0)
    model = DiT(patch=patch, dim=dim, depth=depth, n_heads=n_heads,
                in_channels=1, qkv_fused=qkv_fused, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 28, 28, 1))
    params_list = [
        jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16),
            model.init(jax.random.fold_in(key, i), x0, jnp.ones((1,))))
        for i in range(3)
    ]
    apply_fn = (make_folded_apply(model, fold_ln=fold_ln,
                                  pallas_attn=pallas_attn,
                                  fused_block=fused_block) if folded
                else model.apply)
    stack = experts.ExpertStack(apply_fn, params_list)
    schedule = VPSchedule()
    w = jnp.ones((3,), jnp.float32)

    def eps_fn(x, t):
        eps = stack(x.astype(jnp.bfloat16), t.astype(jnp.bfloat16))
        return compose.weighted(eps.astype(jnp.float32), w)

    @jax.jit
    def sample(key):
        x = jax.random.normal(key, (batch_size, 28, 28, 1), jnp.float32)
        return samplers.ddim(eps_fn, schedule, x, n_steps).sum()

    per_batch = _timed_iters(sample, key, iters, warmups=1)
    return batch_size / per_batch


def measure_shapes_throughput(iters: int = 3, bs: int = 128,
                              base_dim: int = 64, img_size: int = 64,
                              n_steps: int = 50,
                              model_cfg: str = "unet64") -> float:
    """Secondary benchmark (reported in "extra"): the compose_images_ddim
    workload — RGB conditional 2-expert DDIM composition. Defaults define
    the recorded metric (64x64, 50 steps, base-64 UNet — measured at its
    architectural ceiling ~217 img/s, DESIGN.md §3.2). ``model_cfg``
    "dit_p<P>_d<D>_l<L>" serves the same workload with a 64x64 DiT through
    the folded path (quality gate: scripts/quality_gate_shapes.py —
    VERDICT r3 item 6). The shape parameters exist for CPU smoke tests
    only; UNet img_size must be divisible by 4 (two downsamples)."""
    key = jax.random.PRNGKey(0)
    if model_cfg.startswith("unet"):
        assert img_size % 4 == 0, \
            "channel_mults=(1,2,4) needs img_size % 4 == 0"
        base_dim = int(model_cfg[4:]) if model_cfg[4:] else base_dim
        model = UNet(in_channels=3, base_dim=base_dim,
                     channel_mults=(1, 2, 4), num_classes=(3,),
                     dtype=jnp.bfloat16)
        apply_fn = model.apply
        # (K, B) labels: the historical bench layout
        labels = experts.per_expert(jnp.zeros((2, bs), jnp.int32))
    else:
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        spec = {p[0]: int(p[1:]) for p in model_cfg[4:].split("_")}
        model = DiT(patch=spec["p"], dim=spec["d"], depth=spec["l"],
                    n_heads=8, in_channels=3, num_classes=(3,),
                    dtype=jnp.bfloat16)
        apply_fn = make_folded_apply(model)
        # batch-constant cell labels, batch-1 (folded-path contract)
        labels = experts.per_expert(jnp.zeros((2, 1), jnp.int32))
    x0 = jnp.zeros((1, img_size, img_size, 3))
    lab = jnp.zeros((1,), jnp.int32)
    params_list = [
        jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16),
            model.init(jax.random.fold_in(key, i), x0, jnp.ones((1,)), lab))
        for i in range(2)
    ]
    stack = experts.ExpertStack(apply_fn, params_list)
    schedule = VPSchedule()
    w = jnp.ones((2,), jnp.float32)
    # default bs=128: measured sweet spot (64: 161, 128: 205, 192: 181 img/s)

    def eps_fn(x, t):
        eps = stack(x.astype(jnp.bfloat16), t.astype(jnp.bfloat16), labels)
        return compose.weighted(eps.astype(jnp.float32), w)

    @jax.jit
    def sample(key):
        x = jax.random.normal(key, (bs, img_size, img_size, 3), jnp.float32)
        return samplers.ddim(eps_fn, schedule, x, n_steps).sum()

    per_batch = _timed_iters(sample, key, iters, warmups=1)
    return bs / per_batch


def gate_verdict(flagship: str):
    """Committed quality-gate verdict for a flagship config, from
    artifacts/quality_gate*/quality_<flagship>*.json ("verdict" written by
    scripts/quality_gate_flagship.py --baseline since r4). Returns
    (verdict_or_None, path_or_None).

    Selection is DETERMINISTIC (ADVICE r4 item 4 — mtime is checkout time
    after a fresh clone): a PASS at ANY training budget wins over FAILs at
    other budgets (budget is a recipe axis, and a config that FAILs at 12k
    but PASSes at 24k is a passing config whose recipe costs 24k steps —
    the returned path carries the budget the claim rests on); among
    multiple PASSes (or only FAILs) the highest budget wins, then the
    lexicographically last path (later round directories sort later)."""
    import glob
    import os
    root = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(root, "artifacts", "quality_gate*",
                                   f"quality_{flagship}*.json"))
    candidates = []
    for p in sorted(paths):
        try:
            with open(p) as f:
                rep = json.load(f)
        except (OSError, ValueError):
            continue
        v = rep.get("verdict")
        if v:
            candidates.append((v == "PASS", int(rep.get("train_steps", 0)),
                               p, v))
    if not candidates:
        return None, None
    _, _, p, v = max(candidates)
    return v, p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", default="dit_p14_d256_l4",
                    help="headline model config: dit_p<P>_d<D>_l<L>[_h<H>] "
                         "or unet<W>. Default is the r5 quality-gated DiT "
                         "(artifacts/quality_gate_r5: FAILs the self-judged "
                         "gate at 24k train steps but PASSes at 48k with "
                         "escalated n=1024 sampling — training budget is a "
                         "recipe axis; 48k steps cost ~6 min at the "
                         "measured train rate). 'dit_p14_d256_l6' is the "
                         "stronger-margin r5 runner-up (in-union 0.9463 "
                         "vs l4's 0.9404), 'dit_p7_d256_l6' the r4 "
                         "flagship, 'dit_p7_d256_l8' the r3 one; 'unet64' "
                         "reproduces the r1/r2 reference-architecture "
                         "headline.")
    ap.add_argument("--batch_sizes", default="2048,4096,8192",
                    help="headline sweep (the p14 flagship peaks at "
                         "4096-8192; p7 DiTs want ~512-1024, unet "
                         "flagships ~256,384,512)")
    ap.add_argument("--base_dim", type=int, default=64,
                    help="reference mnist UNet width (unet_small.py:49) for "
                         "the parity extra (and the unet<W> flagship path)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--img_size", type=int, default=28,
                    help="experimentation only: 32 measures the 8-aligned "
                         "canvas variant (changes the workload; the headline "
                         "number is defined at 28)")
    ap.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas GroupNorm+SiLU in the resblocks")
    ap.add_argument("--pad_to", type=int, default=0,
                    help="compute on a zero-padded square canvas of this "
                         "size (e.g. 32): same 28x28 images in/out, all "
                         "spatial dims 8-aligned for the conv emitter")
    ap.add_argument("--qkv_fused", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="DiT flagships: FusedQKVAttention (one QKV GEMM) "
                         "instead of stock flax MHDPA — same math in exact "
                         "arithmetic (test_models.py transplant parity; "
                         "under bf16 the fused path softmaxes in fp32 where "
                         "stock flax uses bf16, i.e. strictly more precise) "
                         "so the quality gate verdict carries over. Default "
                         "ON since the bs-768 A/B (scripts/profile_dit.py): "
                         "full 50-step 3-expert sampler 1295 vs 1239 img/s. "
                         "--no-qkv_fused restores stock MHDPA.")
    ap.add_argument("--fold_ln", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="with --folded: additionally fold the LayerNorm "
                         "normalization into the GEMM epilogue (raw-stream "
                         "GEMM + per-row stats correction; "
                         "make_folded_apply(fold_ln=True)). Default off "
                         "pending the profile_dit A/B.")
    ap.add_argument("--pallas_attn", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="with --folded: fused scores/softmax/value Pallas "
                         "kernel (ops.short_seq_attention) instead of the "
                         "einsum chain. Default None = auto (on for TPU). "
                         "Same attention math (interpret-mode parity in "
                         "test_pallas_kernels.py); scores stay fp32 where "
                         "the einsum path rounds them to bf16.")
    ap.add_argument("--fused_block", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="with --folded: run each whole DiT block (LN, QKV "
                         "GEMM, attention, proj+residual, LN, MLP+residual) "
                         "as ONE Pallas kernel (ops.fused_dit_block; "
                         "subsumes --pallas_attn). Default None = auto (on "
                         "for TPU, matching make_folded_apply); "
                         "--no-pallas_attn implies --no-fused_block so the "
                         "measured path honestly contains no Pallas "
                         "attention (ADVICE r4 item 1).")
    ap.add_argument("--folded", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="DiT flagships: serve with models.dit."
                         "make_folded_apply — per-step adaLN modulation/gate "
                         "vectors folded into the GEMM weights, patchify as "
                         "reshape+GEMM (VERDICT r3 item 1). Same param tree "
                         "and math as DiT.apply (TestFoldedDiT parity), so "
                         "the quality-gate verdict carries over. A/B vs "
                         "stock in scripts/profile_dit.py.")
    ap.add_argument("--shapes_flagship", default="unet64",
                    help="model serving the shapes-64 secondary row: "
                         "unet64 (reference parity, measured ceiling ~217 "
                         "img/s) or dit_p<P>_d<D>_l<L> through the folded "
                         "path — must PASS scripts/quality_gate_shapes.py "
                         "(VERDICT r3 item 6); reported as "
                         "extra.shapes64_flagship_images_per_sec alongside "
                         "the always-measured unet64 parity row")
    ap.add_argument("--force", action="store_true",
                    help="measure a flagship whose newest committed quality "
                         "gate verdict is FAIL (headline numbers must come "
                         "from quality-gated configs — VERDICT r3 item 4)")
    ap.add_argument("--skip_extras", action="store_true",
                    help="measure only the headline MNIST sampler program "
                         "(skip train/shapes/DiT secondaries) — for "
                         "candidate-width sweeps where only the headline "
                         "path varies; extras report 0.0")
    args = ap.parse_args()

    # --no-pallas_attn promises a Pallas-free attention path; the fused
    # block kernel contains one, so it must come off too (ADVICE r4 item 1)
    if args.pallas_attn is False:
        if args.fused_block:
            ap.error("--no-pallas_attn with --fused_block is inconsistent: "
                     "the fused block kernel runs the Pallas attention "
                     "internally")
        args.fused_block = False

    verdict, vpath = gate_verdict(args.flagship)
    if verdict == "FAIL" and not args.force:
        print(f"FATAL: flagship {args.flagship!r} FAILED its newest quality "
              f"gate ({vpath}) — a non-passing config may not be the "
              "headline. Re-gate it (scripts/quality_gate_flagship.py) or "
              "pass --force for an exploratory measurement.",
              file=sys.stderr)
        sys.exit(2)
    if verdict is None:
        print(f"# no committed gate verdict found for {args.flagship!r} "
              "(pre-r4 gate artifacts are human-read; "
              "artifacts/quality_gate_r3 covers dit_p7_d256_l8 and unet64)",
              file=sys.stderr)

    # Fail fast (and legibly) when the tunneled TPU is unreachable: a hung
    # tunnel blocks the first device op forever, which would record as an
    # opaque timeout. The probe runs in a killable subprocess
    # (__graft_entry__._safe_device_count) with bounded retries for
    # transient tunnel degradation.
    from __graft_entry__ import _safe_compute_probe, _safe_device_count
    for attempt in range(3):
        # two-stage probe: device enumeration AND an actual tiny program —
        # a degraded tunnel passes the first while hanging every dispatch
        n_dev = _safe_device_count(timeout_s=60.0)
        if n_dev and _safe_compute_probe():
            break
        print(f"# device/compute probe {attempt + 1}/3 failed (backend "
              "init hung, raised, or dispatch stalled); retrying in 20 s",
              file=sys.stderr)
        time.sleep(20)
    else:
        print("FATAL: no usable accelerator backend after 3 probes — the "
              "TPU tunnel is down (environmental). Re-run when it recovers; "
              "last known-good numbers are in BENCH_r01.json / README.",
              file=sys.stderr)
        sys.exit(3)

    # the probes can pass and the next in-process dispatch still hang
    # (observed r4: the tunnel blocks INSIDE a C call, zero CPU, no
    # exception) — arm the stall watchdog so the bench dies legibly with
    # exit 42 instead of hanging the driver
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
        __file__)), "scripts"))
    from _common import start_stall_watchdog
    start_stall_watchdog()

    unet_flagship = args.flagship.startswith("unet")
    if unet_flagship:
        args.base_dim = int(args.flagship[4:])
        gfi = gflop_per_image(args.base_dim, args.img_size, args.pad_to)
    else:
        spec = {p[0]: int(p[1:]) for p in args.flagship[4:].split("_")}
        gfi = dit_gflop_per_image(28, spec["p"], spec["d"], spec["l"])

    best_ips, best_bs, best_t = 0.0, 0, 0.0
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        try:
            if unet_flagship:
                ips, t = run(bs, args.base_dim, args.iters, args.use_pallas,
                             args.img_size, args.pad_to)
            else:
                ips = measure_dit_throughput(
                    batch_size=bs, iters=args.iters, dim=spec["d"],
                    depth=spec["l"], patch=spec["p"],
                    qkv_fused=args.qkv_fused, folded=args.folded,
                    fold_ln=args.fold_ln, pallas_attn=args.pallas_attn,
                    fused_block=args.fused_block,
                    n_heads=spec.get("h", 8))
                t = bs / ips
        except Exception as e:  # OOM at large batch: skip
            print(f"# batch {bs} failed: {type(e).__name__}", file=sys.stderr)
            continue
        print(f"# batch {bs}: {ips:.1f} img/s ({t * 1e3:.1f} ms/batch)",
              file=sys.stderr)
        if ips > best_ips:
            best_ips, best_bs, best_t = ips, bs, t

    steps_per_sec = 50.0 / best_t if best_t else 0.0
    shapes_flag_ips = 0.0
    if args.skip_extras:
        train_ips = shapes_ips = dit_ips = unet_parity_ips = 0.0
    else:
        train_ips = measure_train_throughput(args.base_dim)
        shapes_ips = measure_shapes_throughput()
        if args.shapes_flagship != "unet64":
            sv, sp = gate_verdict(f"shapes_{args.shapes_flagship}")
            if sv == "PASS" or args.force:
                shapes_flag_ips = measure_shapes_throughput(
                    model_cfg=args.shapes_flagship)
            else:
                print(f"# shapes flagship {args.shapes_flagship!r} has no "
                      f"PASS gate verdict (found: {sv}) — skipping "
                      "(quality_gate_shapes.py gates it; --force overrides)",
                      file=sys.stderr)
        dit_ips = measure_dit_throughput()
        # reference-architecture parity row (the r1/r2 headline): base-64
        # M1 UNet at its measured-best batch, so the old number stays
        # trackable round over round
        unet_parity_ips = (best_ips if unet_flagship and args.base_dim == 64
                           else run(384, 64, args.iters)[0])
    dit_tflops = dit_ips * dit_gflop_per_image() / 1e3
    # progress against the physics ceiling, not just the target number:
    # implied TF/s = analytic FLOPs/image x img/s; MFU = that / chip peak
    implied_tflops = best_ips * gfi / 1e3
    print(json.dumps({
        "metric": "mnist_images_per_sec_ddim50_3experts",
        "value": round(best_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(best_ips / BASELINE_IMGS_PER_SEC, 3),
        "extra": {"flagship": args.flagship,
                  "quality_gate": (vpath or "artifacts/quality_gate_r3"),
                  "quality_gate_verdict": verdict,
                  # attention/serving path of the HEADLINE number (ADVICE
                  # r3: keep round-over-round comparisons unambiguous); the
                  # dit_eval_flagship extra row is intentionally stock
                  # (unfolded, MHDPA) so the r2 number stays trackable
                  "qkv_fused": bool(args.qkv_fused),
                  "folded": bool(args.folded),
                  "fold_ln": bool(args.fold_ln),
                  "pallas_attn": args.pallas_attn,
                  "fused_block": args.fused_block,
                  "batch_size": best_bs,
                  "sampler_steps_per_sec": round(steps_per_sec, 2),
                  "unet64_parity_images_per_sec": round(unet_parity_ips, 1),
                  "train_images_per_sec": round(train_ips, 1),
                  "shapes64_images_per_sec": round(shapes_ips, 1),
                  "shapes64_flagship": args.shapes_flagship,
                  "shapes64_flagship_images_per_sec": round(
                      shapes_flag_ips, 1),
                  "dit_eval_flagship_images_per_sec": round(dit_ips, 1),
                  "dit_eval_flagship_mfu": round(
                      dit_tflops / CHIP_PEAK_TFLOPS, 3),
                  "gflop_per_image": round(gfi, 2),
                  "implied_tflops": round(implied_tflops, 1),
                  "mfu": round(implied_tflops / CHIP_PEAK_TFLOPS, 3),
                  "roofline_images_per_sec": round(
                      CHIP_PEAK_TFLOPS * 1e3 / gfi),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
