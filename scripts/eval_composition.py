#!/usr/bin/env python
"""Quantitative compositional-generalization evaluation (beyond-reference).

Trains two single-factor conditional experts (shape-or-digit | color) on the
SAME holdout-filtered data (neither ever sees a held-out pair), composes them
with DDIM for every combination, and scores the samples with a probe
classifier trained on the full dataset (eval.py). The reference only ever
eyeballs PNG grids for this claim
(src/composing_conditional_diffusion_on_shape_and_color_2.py's holdout
runs); here the deliverable is a JSON metric table where ``joint_acc`` on a
held-out pair is the generalization score. Supports the shapes (3x3) and
colored-MNIST (10x3) factored datasets.

Metric hardening (VERDICT r2): ``--probe_seeds 2`` trains a second
independently-seeded eval probe and reports per-probe accuracy plus
cross-probe agreement; every score row carries the probe's mean
target-class probability (margin) so a high-accuracy/low-margin cell is
visible. ``--holdout_sweep all`` repeats the whole protocol once per
held-out cell and reports mean/min/max across cells (operator rankings
from a single cell are single-sample claims).

Example (sanity, ~2 min TPU):
  python scripts/eval_composition.py --sanity
Full run:
  python scripts/eval_composition.py --train.steps=3000 --samples_per_combo 64
"""

import argparse
import functools
import json
import os
import pickle

import jax
import jax.numpy as jnp

from _common import (add_runtime_flags, apply_runtime_flags,
                     require_accelerator)

from composable_diffusion_models_tpu import compose, data, eval as ceval
from composable_diffusion_models_tpu import samplers, train
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.models import UNet
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shapes_ddim")
    ap.add_argument("--dataset", default="shapes",
                    choices=["shapes", "colored_mnist"],
                    help="factored dataset: shapes (shape x color, 3x3) or "
                         "colored_mnist (digit x color, 10x3)")
    ap.add_argument("--holdout", default="[[2,2]]",
                    help="JSON list of held-out (factor0, factor1) pairs")
    ap.add_argument("--holdout_sweep", default=None,
                    help="sweep the held-out cell: 'all' runs the protocol "
                         "once per single-cell holdout over every "
                         "combination; a JSON list (e.g. [[7,2],[3,0]]) "
                         "sweeps those cells. Overrides --holdout; reports "
                         "mean/min/max held-out joint accuracy per operator "
                         "across cells (single-cell rankings are "
                         "single-sample claims)")
    ap.add_argument("--samples_per_combo", type=int, default=32)
    ap.add_argument("--probe_steps", type=int, default=1200)
    ap.add_argument("--probe_noise", type=float, default=0.1,
                    help="Gaussian noise aug for probe robustness")
    ap.add_argument("--probe_seeds", type=int, default=1,
                    help=">1 trains extra independently-seeded eval probes: "
                         "reports per-probe joint accuracy and cross-probe "
                         "agreement (a single probe leaves the metric "
                         "gameable by samples only that probe credits)")
    ap.add_argument("--n_steps", type=int, default=200)
    ap.add_argument("--w_shape", type=float, default=1.0)
    ap.add_argument("--w_color", type=float, default=1.0)
    ap.add_argument("--weight_grid", default=None,
                    help="JSON list of [w_shape, w_color] pairs to sweep on "
                         "the SAME trained experts (weights are traced args: "
                         "one compile covers the whole sweep); overrides "
                         "--w_shape/--w_color")
    ap.add_argument("--op", default="avg",
                    help="comma list of composition operators to evaluate on "
                         "the same trained experts: avg (weighted score "
                         "average, reference op-1), ito (equal-density-path "
                         "AND via jvp-divergence kappa + prob-flow ODE, "
                         "reference op-2), cfg (CFG conjunction "
                         "eps_u + sum_i w_i (eps_i - eps_u) with eps_u = "
                         "mean of the experts' null-token outputs, "
                         "reference op-5, _5.py:313-325), proj/proj_cfg "
                         "(projection substitution, compose.projected — "
                         "needs --factor0_grayscale --gray_norm), "
                         "cg (equal-weight avg steered by a VP-noised "
                         "holdout-filtered guidance probe at scale w[0] — "
                         "beyond-reference classifier guidance), and/or "
                         "proj_cg (projection substitution at strength w[0] "
                         "PLUS probe guidance at scale w[1] — stacks the two "
                         "measured-best held-out levers)")
    ap.add_argument("--t_switch", type=float, default=None,
                    help="t-scheduled operators: projection substitution "
                         "active only at t >= t_switch (the high-noise "
                         "structure-forming phase), proj_cg's probe "
                         "guidance active only at t < t_switch (the "
                         "low-noise refinement phase where the probe's "
                         "gradients are informative). kappa and guidance "
                         "needs are t-dependent — this implements "
                         "'proj early / cfg late'")
    ap.add_argument("--factor0_grayscale", action="store_true",
                    help="train the factor-0 (shape/digit) expert on the "
                         "GRAYSCALE projection of the data — the reference's "
                         "own held-out-generalization recipe (a color-blind "
                         "shape expert cannot oppose unseen colors; "
                         "shapes/compose_images_{ddim,ito}.py). Composition "
                         "lifts its eps back to RGB by channel broadcast.")
    ap.add_argument("--gray_norm", action="store_true",
                    help="with --factor0_grayscale: use the unit-norm luma "
                         "projection sum(x*w)/||w|| for both training data "
                         "and the sampling-time adapter — the gray view of "
                         "the RGB diffusion state is then an EXACT diffusion "
                         "state (plain luma understates the noise level by "
                         "0.67x; see experts.rgb_to_gray)")
    ap.add_argument("--gray_proj", default="luma", choices=["luma", "equal"],
                    help="with --factor0_grayscale: channel weights of the "
                         "gray projection. 'luma' = ITU-601 (the reference's "
                         "torchvision Grayscale) gives the shape expert "
                         "authority w_c/||w|| over channel c — only 0.17 for "
                         "BLUE, which is why every blue column of the luma "
                         "runs is the weak one; 'equal' = (1,1,1)/sqrt(3) "
                         "gives each channel 0.577 so held-out colors are "
                         "equally steerable")
    ap.add_argument("--hue_aug", type=float, default=0.0,
                    help="with --factor0_grayscale: per-sample random RGB "
                         "channel gains in [hue_aug, 1] (in [0,1] pixel "
                         "space) applied BEFORE the luma projection of the "
                         "factor-0 training data. The gray shape expert "
                         "then sees every shape at many luma intensities, "
                         "so the luma a HELD-OUT color produces is "
                         "in-distribution instead of an unseen brightness "
                         "level. 0 disables; 0.25 is a reasonable strength")
    ap.add_argument("--corrector_steps", type=int, default=0,
                    help="Langevin (ULA) corrector steps per DDIM level — "
                         "predictor-corrector sampling re-equilibrates "
                         "toward the composed density at every noise level "
                         "(Du et al. 2023: composed score fields are not "
                         "exact gradients; MCMC samples the intended "
                         "product). Applies to every eps-closure operator "
                         "(not ito, which is its own ODE).")
    ap.add_argument("--corrector_snr", type=float, default=0.16,
                    help="signal-to-noise step-size ratio for the corrector")
    ap.add_argument("--corrector_t_max", type=float, default=1.0,
                    help="apply the corrector only at noise levels "
                         "t <= this (the full-range corrector collapsed "
                         "held-out transfer to 0.00 — "
                         "artifacts/cg_snr_corrector; the composed score is "
                         "least gradient-like at high noise)")
    ap.add_argument("--uncond_prob", type=float, default=0.1,
                    help="CFG label-dropout rate for expert training; 0 "
                         "trains plain conditional experts (the measured "
                         "best for the avg operator; cfg then has no null "
                         "row to use)")
    ap.add_argument("--sanity", action="store_true")
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=0)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)
    if not args.cpu:
        require_accelerator()

    cfg = get_config(args.preset, overrides)
    if args.sanity:
        cfg.train.sanity = True  # apply_sanity is gated on this flag
        cfg.apply_sanity()
        args.probe_steps = 200
        args.samples_per_combo = 8
        args.n_steps = min(args.n_steps, 20)
    known_ops = ("avg", "ito", "cfg", "proj", "proj_cfg", "cg", "proj_cg")
    bad = [o for o in args.op.split(",") if o not in known_ops]
    if bad:
        ap.error(f"unknown --op {bad}; choose from {known_ops} "
                 "(fail fast — expert training costs minutes)")
    if args.uncond_prob == 0.0 and {"cfg", "proj_cfg"} & set(args.op.split(",")):
        ap.error("--op cfg/proj_cfg needs --uncond_prob > 0 (null-token "
                 "training; otherwise the null embedding row is random init)")
    if ({"proj", "proj_cfg", "proj_cg"} & set(args.op.split(","))
            and not (args.factor0_grayscale and args.gray_norm)):
        ap.error("--op proj (projection substitution, compose.projected) "
                 "needs --factor0_grayscale --gray_norm so the factor-0 "
                 "expert estimates exactly P eps")
    if args.hue_aug and not args.factor0_grayscale:
        ap.error("--hue_aug augments the factor-0 GRAYSCALE training data; "
                 "it needs --factor0_grayscale")
    weight_grid_pre = (json.loads(args.weight_grid) if args.weight_grid
                       else [[args.w_shape, args.w_color]])
    if "avg" in args.op.split(",") and any(sum(w) == 0 for w in weight_grid_pre):
        ap.error("avg weights must not sum to 0 (compose.weighted divides "
                 "by sum(w); fail fast — expert training costs minutes)")
    key = jax.random.PRNGKey(args.seed)
    size = cfg.data.img_size
    schedule = VPSchedule(kind=cfg.schedule.kind)
    mgr = CheckpointManager(args.out, "eval_composition")

    # data: full set for the probe; holdout-filtered for BOTH experts
    # (neither expert ever sees a held-out pair — the src-family
    # generalization protocol, …shape_and_color_2.py:61-166)
    if args.dataset == "shapes":
        n_classes = (3, 3)
        full_imgs, full_s, full_c = data.make_shapes_dataset(cfg.data.n, size)

        def held_data(holdout):
            return data.make_shapes_dataset(cfg.data.n, size, holdout=holdout)
    else:  # colored_mnist: digit x random color (D6/D7)
        n_classes = (10, 3)
        size = 28
        full_imgs, full_s, full_c = data.colored_mnist(
            jax.random.fold_in(key, 7), cfg.data.n, color_rule="random")

        def held_data(holdout):
            return data.colored_mnist(jax.random.fold_in(key, 7), cfg.data.n,
                                      color_rule="random", holdout=holdout)

    # holdout cells: a single run (the --holdout list) or a sweep of
    # single-cell holdouts
    if args.holdout_sweep:
        if args.holdout_sweep.strip() == "all":
            cells = [[(s, c)] for s in range(n_classes[0])
                     for c in range(n_classes[1])]
        else:
            cells = [[tuple(p)] for p in json.loads(args.holdout_sweep)]
    else:
        cells = [[tuple(h) for h in json.loads(args.holdout)]]

    # sub-cell work units are pickle-cached next to the report: the tunnel's
    # up-windows (r4: ~10-20 min between multi-minute hangs) are shorter
    # than a full sweep, so a relaunched run must only redo the unit it was
    # killed in (cells themselves resume via the .partial report below).
    # Tags carry a HASH of every hyperparameter that shapes the cached value
    # (ADVICE r4 item 2: a tag keyed only by dataset+cell silently reuses
    # experts trained for a DIFFERENT holdout/recipe — likely inflating
    # heldout_joint_acc since those experts may have SEEN the held-out
    # combo; a --smoke probe would poison later full runs the same way).
    def _cfg_hash(parts: dict) -> str:
        import hashlib
        blob = json.dumps(parts, sort_keys=True, default=str)
        return hashlib.sha1(blob.encode()).hexdigest()[:10]

    def _cached(tag, build):
        path = os.path.join(mgr.results_dir, f"cache_{tag}.pkl")
        if os.path.exists(path):
            # guarded load (ADVICE r4 item 3): the kill-mid-run scenario
            # this cache exists for can truncate the pickle; a crash here
            # would loop forever under tpu_retry.sh
            try:
                with open(path, "rb") as f:
                    return pickle.load(f)
            except (EOFError, pickle.UnpicklingError, ValueError, OSError):
                print(f"corrupt cache {path} — deleting and rebuilding")
                os.remove(path)
        val = build()
        import numpy as _np
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(_np.asarray, val), f)
        os.replace(tmp, path)  # atomic: never a half-written cache
        return val

    # eval probe(s) on the FULL data (they must know what held-out combos
    # look like); extra seeds give independent verdicts on the same samples
    probe_hash = _cfg_hash({
        "probe_steps": args.probe_steps, "probe_noise": args.probe_noise,
        "data_n": cfg.data.n, "size": size, "seed": args.seed})
    probes = []
    for i in range(args.probe_seeds):
        print(f"training eval probe {i} ...")
        pm = ceval.ProbeClassifier(tuple(n_classes), 32, jnp.bfloat16)
        pp = _cached(
            f"probe{i}_{args.dataset}_{probe_hash}",
            lambda: ceval.train_probe(
                jax.random.fold_in(key, 1 + 1000 * i), full_imgs,
                (full_s, full_c), num_classes=n_classes,
                steps=args.probe_steps, noise_aug=args.probe_noise)[1])
        sanity = ceval.probe_accuracy(pm, pp, full_imgs[:512],
                                      (full_s[:512], full_c[:512]))
        print(f"probe {i} held-in accuracy: {sanity}")
        probes.append((pm, pp))
    probe, probe_params = probes[0]

    # experts: same architecture, same (holdout-filtered) RGB data, each
    # conditioned on ONE factor — composition is the weighted score average
    # (reference op-1, …shape_and_color.py:352)
    # both experts get a null token + CFG dropout so avg and cfg composition
    # are compared on identical trained weights (null row unused by avg)
    from composable_diffusion_models_tpu.experts import (gray_to_rgb,
                                                         rgb_to_gray)
    f0_ch = 1 if args.factor0_grayscale else 3
    gray_w = (1.0, 1.0, 1.0) if args.gray_proj == "equal" else None

    def expert_model(in_ch, n_cls):
        # honor --model.kind so the DiT backbone runs the same protocol
        # (models/dit.py is apply-compatible with UNet)
        if cfg.model.kind == "dit":
            from composable_diffusion_models_tpu.models import DiT
            return DiT(patch=cfg.model.patch, dim=cfg.model.hidden,
                       depth=cfg.model.depth, n_heads=cfg.model.n_heads,
                       in_channels=in_ch, num_classes=(n_cls,),
                       null_token=True)
        return UNet(in_channels=in_ch, base_dim=cfg.model.base_dim,
                    channel_mults=tuple(cfg.model.channel_mults),
                    num_classes=(n_cls,), null_token=True)

    shape_model = expert_model(f0_ch, n_classes[0])
    color_model = expert_model(3, n_classes[1])
    need_gprobe = bool({"cg", "proj_cg"} & set(args.op.split(",")))
    bs = args.samples_per_combo
    null_s = jnp.full((bs,), n_classes[0], jnp.int32)
    null_c = jnp.full((bs,), n_classes[1], jnp.int32)
    gprobe_model = ceval.ProbeClassifier(n_classes) if need_gprobe else None
    t_switch = args.t_switch

    def train_experts(held_imgs, held_s, held_c, cell_idx):
        """Train the two single-factor experts for one holdout setting.
        Expert params are returned (traced args of _sample below), so a
        holdout sweep reuses the op's ONE compiled sampler per cell."""
        kc = jax.random.fold_in(key, 50 + cell_idx)
        f0_src = held_imgs
        if args.hue_aug > 0.0:
            # random per-sample channel gains in [0,1] pixel space: the
            # black background stays black, the shape's luma level varies
            gains = jax.random.uniform(
                jax.random.fold_in(kc, 5), (held_imgs.shape[0], 1, 1, 3),
                minval=args.hue_aug, maxval=1.0)
            f0_src = ((held_imgs + 1.0) * 0.5 * gains) * 2.0 - 1.0
        f0_imgs = (rgb_to_gray(f0_src, normalized=args.gray_norm,
                               weights=gray_w)
                   if args.factor0_grayscale else held_imgs)
        lab0 = jnp.zeros((1,), jnp.int32)
        print(f"training factor-0 expert ({'gray' if f0_ch == 1 else 'RGB'} "
              "| shape/digit) ...")
        sp, sl_losses = train.train_expert(
            jax.random.fold_in(kc, 2), shape_model.apply,
            shape_model.init(key, jnp.zeros((1, size, size, f0_ch)),
                             jnp.ones((1,)), lab0),
            schedule, f0_imgs, (held_s,), steps=cfg.train.steps,
            batch_size=cfg.train.batch_size, lr=cfg.train.lr,
            uncond_prob=args.uncond_prob, null_labels=(n_classes[0],),
            ema_decay=cfg.train.ema_decay or None,
            snr_gamma=cfg.train.snr_gamma or None)
        print(f"  final loss {float(sl_losses[-1]):.4f}")
        print("training factor-1 expert (RGB | color) ...")
        cp, cl_losses = train.train_expert(
            jax.random.fold_in(kc, 3), color_model.apply,
            color_model.init(key, jnp.zeros((1, size, size, 3)),
                             jnp.ones((1,)), lab0),
            schedule, held_imgs, (held_c,), steps=cfg.train.steps,
            batch_size=cfg.train.batch_size, lr=cfg.train.lr,
            uncond_prob=args.uncond_prob, null_labels=(n_classes[1],),
            ema_decay=cfg.train.ema_decay or None,
            snr_gamma=cfg.train.snr_gamma or None)
        print(f"  final loss {float(cl_losses[-1]):.4f}")

        gpp = None
        if need_gprobe:
            # classifier-guidance probe: trained on the SAME holdout-filtered
            # data the experts see (no leakage of held-out combos — unlike
            # the eval probe above, which must know them to score them),
            # VP-noised across t so its log p(y | x_t) gradients are
            # meaningful along the whole sampling trajectory. Its per-factor
            # heads are independent, so guidance toward a held-out
            # (shape, color) pair is itself compositional:
            # grad log p(y_s|x) + grad log p(y_c|x).
            print("training guidance probe (holdout-filtered, VP-noised) ...")
            _, gpp = ceval.train_probe(
                jax.random.fold_in(kc, 7), held_imgs, (held_s, held_c),
                num_classes=n_classes, steps=args.probe_steps,
                vp_schedule=schedule)
        return sp, cp, gpp

    @functools.partial(jax.jit, static_argnames=("op",))
    def _sample(sp, cp, gpp, sl, cl, weights, k, op):
        # labels, weights AND expert params are traced args: ONE compile per
        # operator covers every combo and every holdout cell of a sweep.
        # The cond+null fan-out folds into the batch axis (one 2B forward
        # per expert — the reference's "highly efficient" layout,
        # cross_attention.py:282-292).
        def apply_f0(params, x, t, labels):
            # grayscale protocol: project the RGB state, lift eps back.
            # Under --gray_norm the lift is the PROJECTION ADJOINT (g * u,
            # u = w/||w||) — the expert estimates P eps, and equal broadcast
            # would scale its luma component 1.49x and leak into chroma;
            # plain-luma experts keep the reference's channel broadcast
            # (compose_images_ddim.py:31,52). jvp-divergence in ito flows
            # through the adapters unchanged (ito_2.py:46-69).
            if f0_ch == 1:
                return gray_to_rgb(
                    shape_model.apply(
                        params, rgb_to_gray(x, normalized=args.gray_norm,
                                            weights=gray_w),
                        t, labels),
                    normalized=args.gray_norm, weights=gray_w)
            return shape_model.apply(params, x, t, labels)

        if op == "ito":
            # equal-density-path AND (reference op-2): kappa from jvp
            # divergences, probability-flow ODE
            def shape_score(x, t):
                return -apply_f0(sp, x, t, sl)

            def color_score(x, t):
                return -color_model.apply(cp, x, t, cl)

            x_init = jax.random.normal(k, (bs, size, size, 3))
            return samplers.ito_kappa_ode(
                (shape_score, color_score), schedule,
                jax.random.fold_in(k, 1), x_init, args.n_steps)

        def proj_strength(t):
            # t-scheduled projection: active in the high-noise
            # structure-forming phase (t >= t_switch) when scheduled
            if t_switch is None:
                return weights[0]
            return weights[0] * (t >= t_switch)

        def eps_fn(x, t):
            if op in ("proj", "proj_cg"):
                # projection substitution (compose.projected): the gray
                # expert replaces exactly the luma noise component; the
                # chrominance stays with the color expert. weights[0] is
                # the substitution/steer strength. For proj_cg the probe
                # guidance wrapper below adds grad log p(y|x_t) at scale
                # weights[1] — the color-blind consistent-noise composition
                # plus an explicit pull toward the (held-out) label pair.
                e_c = color_model.apply(cp, x, t, cl)
                e_s = shape_model.apply(
                    sp, rgb_to_gray(x, normalized=True, weights=gray_w),
                    t, sl)
                return compose.projected(e_c, e_s, proj_strength(t),
                                         proj=gray_w or compose.LUMA_W)
            if op == "proj_cfg":
                # CFG inside each expert (guidance strengths = weights),
                # THEN projection substitution at weight 1 — stacks the
                # conditioning lever on the consistent-noise composition
                xg = rgb_to_gray(x, normalized=True, weights=gray_w)
                xg2 = jnp.concatenate([xg, xg])
                e_s2 = shape_model.apply(
                    sp, xg2, t, jnp.concatenate([sl, null_s]))
                x2 = jnp.concatenate([x, x])
                e_c2 = color_model.apply(
                    cp, x2, t, jnp.concatenate([cl, null_c]))
                e_s = e_s2[bs:] + weights[0] * (e_s2[:bs] - e_s2[bs:])
                e_c = e_c2[bs:] + weights[1] * (e_c2[:bs] - e_c2[bs:])
                return compose.projected(e_c, e_s, 1.0,
                                         proj=gray_w or compose.LUMA_W)
            if op == "cfg":
                x2 = jnp.concatenate([x, x])
                e_s2 = apply_f0(sp, x2, t, jnp.concatenate([sl, null_s]))
                e_c2 = color_model.apply(
                    cp, x2, t, jnp.concatenate([cl, null_c]))
                e_s, e_su = e_s2[:bs], e_s2[bs:]
                e_c, e_cu = e_c2[:bs], e_c2[bs:]
                eps_u = 0.5 * (e_su + e_cu)  # shared baseline (_5.py:320)
                return compose.cfg(eps_u, jnp.stack([e_s, e_c]), weights)
            e_shape = apply_f0(sp, x, t, sl)
            e_color = color_model.apply(cp, x, t, cl)
            if op == "cg":
                # equal-weight average, steered by the guidance probe at
                # scale weights[0] (weights[1] unused — see canonical())
                return compose.weighted(
                    jnp.stack([e_shape, e_color]), jnp.ones((2,)))
            return compose.weighted(jnp.stack([e_shape, e_color]), weights)

        if op in ("cg", "proj_cg"):
            def logp_fn(x, t):
                lg_s, lg_c = gprobe_model.apply(gpp, x)
                rows = jnp.arange(bs)
                return (jax.nn.log_softmax(lg_s, axis=-1)[rows, sl]
                        + jax.nn.log_softmax(lg_c, axis=-1)[rows, cl])

            if op == "proj_cg" and t_switch is not None:
                # 'proj early / cfg late': guidance only in the low-noise
                # refinement phase where the probe's gradients are
                # informative on nearly-clean structure
                def scale(t):
                    return weights[1] * (t < t_switch)
            else:
                scale = weights[0] if op == "cg" else weights[1]
            eps_fn = samplers.make_classifier_guided_eps_fn(
                eps_fn, schedule, logp_fn, scale=scale)

        x_init = jax.random.normal(k, (bs, size, size, 3))
        return samplers.ddim(eps_fn, schedule, x_init, args.n_steps,
                             key=jax.random.fold_in(k, 999),
                             corrector_steps=args.corrector_steps,
                             corrector_snr=args.corrector_snr,
                             corrector_t_max=args.corrector_t_max)

    from composable_diffusion_models_tpu.utils.viz import save_grid
    weight_grid = weight_grid_pre

    def canonical(op, wpair):
        # settings that provably produce identical samples: ito ignores the
        # weights entirely; compose.weighted normalizes by sum(w), so
        # uniformly-scaled avg pairs are the same operator. Collapse them
        # instead of re-running minutes of identical sampling per tag.
        if op == "ito":
            return (op,)
        if op == "avg":
            s = sum(wpair)
            return (op,) + tuple(round(w / s, 6) for w in wpair)
        if op in ("proj", "cg"):
            return (op, wpair[0])  # strength/scale only; w[1] unused
        return (op,) + tuple(wpair)

    def evaluate_cell(holdout, cell_idx):
        """The full per-holdout protocol: train experts on the filtered
        data, sample every combo under every operator setting, score."""
        held_imgs, held_s, held_c = held_data(holdout)
        expert_hash = _cfg_hash({
            "holdout": sorted(list(h) for h in holdout),
            "train": {"steps": cfg.train.steps,
                      "batch_size": cfg.train.batch_size,
                      "lr": cfg.train.lr, "ema": cfg.train.ema_decay,
                      "snr_gamma": cfg.train.snr_gamma},
            "model": str(cfg.model), "uncond_prob": args.uncond_prob,
            "hue_aug": args.hue_aug, "f0_gray": args.factor0_grayscale,
            "gray_norm": args.gray_norm, "gray_proj": args.gray_proj,
            "gprobe": (args.probe_steps, args.probe_noise) if need_gprobe
                      else None,
            "data_n": cfg.data.n, "size": size, "seed": args.seed})
        sp, cp, gpp = _cached(
            f"experts_{args.dataset}_cell{cell_idx}_{expert_hash}",
            lambda: train_experts(held_imgs, held_s, held_c, cell_idx))
        gpp_arg = gpp if gpp is not None else jnp.zeros(())
        ops_report = {}
        seen_settings = set()
        cell_tag = ("" if len(cells) == 1
                    else "cell" + "_".join(f"{h[0]}-{h[1]}" for h in holdout)
                    + "_")
        for op in args.op.split(","):
            for wpair in weight_grid:
                key_c = canonical(op, wpair)
                if key_c in seen_settings:
                    print(f"skip {op} w={wpair}: identical to an evaluated "
                          "setting (ito ignores weights; avg is "
                          "scale-invariant)")
                    continue
                seen_settings.add(key_c)
                weights = jnp.asarray(wpair, jnp.float32)
                wtag = (f"{op}" if len(weight_grid) == 1
                        else f"{op}_w{wpair[0]:g}x{wpair[1]:g}")
                report = {"combos": {}, "weights": list(wpair)}
                grids = []
                print(f"--- operator: {wtag} ---")
                for s_lab in range(n_classes[0]):
                    for c_lab in range(n_classes[1]):
                        sl = jnp.full((bs,), s_lab, jnp.int32)
                        cl = jnp.full((bs,), c_lab, jnp.int32)
                        samples = _sample(
                            sp, cp, gpp_arg, sl, cl, weights,
                            jax.random.fold_in(
                                key, 10 + s_lab * n_classes[1] + c_lab),
                            op)
                        grids.append(samples[:4])
                        scores = ceval.compositional_scores(
                            probe, probe_params, samples, (s_lab, c_lab))
                        hits0 = None
                        for pi, (pm, pp) in enumerate(probes[1:], start=2):
                            s2 = ceval.compositional_scores(
                                pm, pp, samples, (s_lab, c_lab))
                            scores[f"probe{pi}_joint_acc"] = s2["joint_acc"]
                            scores[f"probe{pi}_joint_target_prob"] = (
                                s2["joint_target_prob"])
                            if hits0 is None:
                                hits0 = ceval.joint_hits(
                                    probe, probe_params, samples,
                                    (s_lab, c_lab))
                            h2 = ceval.joint_hits(pm, pp, samples,
                                                  (s_lab, c_lab))
                            scores[f"joint_acc_agree_p{pi}"] = float(
                                jnp.mean(hits0 & h2))
                        scores["held_out"] = (s_lab, c_lab) in holdout
                        report["combos"][f"{s_lab},{c_lab}"] = scores
                        tag = " (HELD OUT)" if scores["held_out"] else ""
                        print(f"shape={s_lab} color={c_lab}{tag}: "
                              f"joint_acc={scores['joint_acc']:.3f} "
                              f"shape_acc={scores['factor_0_acc']:.3f} "
                              f"color_acc={scores['factor_1_acc']:.3f} "
                              f"margin={scores['joint_target_prob']:.3f}")

                held = [v["joint_acc"] for v in report["combos"].values()
                        if v["held_out"]]
                seen = [v["joint_acc"] for v in report["combos"].values()
                        if not v["held_out"]]
                report["heldout_joint_acc"] = sum(held) / max(len(held), 1)
                report["seen_joint_acc"] = sum(seen) / max(len(seen), 1)
                grid_path = save_grid(
                    jnp.concatenate(grids, axis=0),
                    f"{mgr.results_dir}/eval_samples_grid_"
                    f"{args.dataset}_{args.op.replace(',', '-')}_"
                    f"{cell_tag}{wtag}.png",
                    nrow=12)
                print(f"[{cell_tag}{wtag}] held-out joint acc "
                      f"{report['heldout_joint_acc']:.3f} "
                      f"| seen joint acc {report['seen_joint_acc']:.3f} "
                      f"| grid {grid_path}")
                ops_report[wtag] = report
        return ops_report

    optag = args.op.replace(",", "-")
    if len(cells) == 1:
        full_report = {"holdout": [list(h) for h in cells[0]],
                       "dataset": args.dataset,
                       "weight_grid": weight_grid,
                       "t_switch": t_switch, "hue_aug": args.hue_aug,
                       "probe_seeds": args.probe_seeds,
                       "ops": evaluate_cell(cells[0], 0)}
        path = (f"{mgr.results_dir}/compositional_eval_{args.dataset}_"
                f"{optag}.json")
    else:
        # holdout sweep: per-cell reports + mean/min/max per operator
        full_report = {"sweep_cells": [[list(h) for h in c] for c in cells],
                       "dataset": args.dataset, "weight_grid": weight_grid,
                       "t_switch": t_switch, "hue_aug": args.hue_aug,
                       "probe_seeds": args.probe_seeds,
                       "cells": {}, "aggregate": {}}
        # per-cell resume: each completed cell is checkpointed to a .partial
        # file, so a killed run (the tunnel degrades for tens of minutes at
        # a time — CLAUDE.md) relaunched by scripts/tpu_retry.sh skips the
        # cells it already trained+scored instead of redoing ~10 min each
        partial_path = (f"{mgr.results_dir}/compositional_sweep_"
                        f"{args.dataset}_{optag}.partial.json")
        if os.path.exists(partial_path):
            try:
                with open(partial_path) as f:
                    prev = json.load(f)
                if (prev.get("sweep_cells") == full_report["sweep_cells"]
                        and prev.get("weight_grid") == weight_grid):
                    full_report["cells"] = prev.get("cells", {})
                    print(f"resuming sweep: {len(full_report['cells'])} "
                          f"cell(s) loaded from {partial_path}")
            except ValueError:
                pass
        for i, holdout in enumerate(cells):
            ctag = ",".join(f"{h[0]}-{h[1]}" for h in holdout)
            if ctag in full_report["cells"]:
                print(f"===== holdout cell {ctag}: cached (resume) =====")
                continue
            print(f"===== holdout cell {ctag} ({i + 1}/{len(cells)}) =====")
            full_report["cells"][ctag] = evaluate_cell(holdout, i)
            with open(partial_path, "w") as f:
                json.dump(full_report, f)
        for wtag in next(iter(full_report["cells"].values())):
            held = [c[wtag]["heldout_joint_acc"]
                    for c in full_report["cells"].values() if wtag in c]
            seen = [c[wtag]["seen_joint_acc"]
                    for c in full_report["cells"].values() if wtag in c]
            full_report["aggregate"][wtag] = {
                "heldout_joint_acc_mean": sum(held) / len(held),
                "heldout_joint_acc_min": min(held),
                "heldout_joint_acc_max": max(held),
                "seen_joint_acc_mean": sum(seen) / len(seen),
                "n_cells": len(held),
            }
            a = full_report["aggregate"][wtag]
            print(f"[sweep {wtag}] held-out joint "
                  f"{a['heldout_joint_acc_mean']:.3f} "
                  f"(min {a['heldout_joint_acc_min']:.3f}, "
                  f"max {a['heldout_joint_acc_max']:.3f}, "
                  f"n={a['n_cells']})")
        path = (f"{mgr.results_dir}/compositional_sweep_{args.dataset}_"
                f"{optag}.json")

    # dataset+op-tagged so successive invocations sharing an --out dir (the
    # orchestration scripts run shapes then colored-MNIST, or avg,ito then
    # avg,cfg) never overwrite each other's reports
    with open(path, "w") as f:
        json.dump(full_report, f, indent=2)
    print(f"report saved to {path}")


if __name__ == "__main__":
    main()
