"""Shared builders for the CLI entry points: config -> (model, schedule, data).

The reference's entry-point names are preserved (train_image, sample_image,
sample_latent, compose_scores, compose_images_ddim, compose_images_ito,
fit_pca, train_latent_2d, superdiff — BASELINE.json 'configs'); each script is
a thin argparse shim over the library.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from composable_diffusion_models_tpu import data as data_lib
from composable_diffusion_models_tpu.models import (DiT, LatentDiffusionMLP,
                                                    ScoreMLP, UNet)
from composable_diffusion_models_tpu.schedules import DDPMSchedule, VPSchedule
from composable_diffusion_models_tpu.utils.config import Config


def build_schedule(cfg: Config):
    if cfg.schedule.family == "ddpm":
        return DDPMSchedule(num_timesteps=cfg.schedule.num_timesteps,
                            beta_schedule=cfg.schedule.beta_schedule)
    return VPSchedule(kind=cfg.schedule.kind)


def build_model(cfg: Config):
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else None
    if m.kind == "unet":
        return UNet(in_channels=m.in_channels, base_dim=m.base_dim,
                    channel_mults=tuple(m.channel_mults),
                    time_emb_dim=m.time_emb_dim,
                    num_classes=tuple(m.num_classes),
                    null_token=m.null_token, cross_attn=m.cross_attn,
                    dtype=dtype, pad_to=m.pad_to or None)
    if m.kind == "dit":
        return DiT(patch=m.patch, dim=m.hidden, depth=m.depth,
                   n_heads=m.n_heads, in_channels=m.in_channels,
                   num_classes=tuple(m.num_classes),
                   null_token=m.null_token, dtype=dtype)
    if m.kind == "mlp":
        return ScoreMLP(hidden=m.hidden, depth=m.depth, out_dim=m.latent_dim)
    if m.kind == "latent_mlp":
        return LatentDiffusionMLP(latent_dim=m.latent_dim, hidden=m.hidden,
                                  depth=m.depth,
                                  num_classes=tuple(m.num_classes),
                                  null_token=m.null_token)
    raise ValueError(f"unknown model kind {m.kind!r}")


def build_dataset(cfg: Config, key):
    """Config-driven wrapper over the data registry (data.get_dataset):
    returns (images, labels_tuple)."""
    d = cfg.data
    kw = {
        "mnist": dict(classes=d.classes, data_dir=d.data_dir),
        "colored_mnist": dict(classes=d.classes, color_rule=d.color_rule,
                              data_dir=d.data_dir,
                              holdout=list(d.holdout) or None),
        "shapes": dict(img_size=d.img_size,
                       grayscale=d.gray_mode if d.grayscale else False,
                       holdout=list(d.holdout) or None,
                       background=d.background),
        "shapes_grayscale": dict(img_size=d.img_size,
                                 # honor data.gray_mode (white|luma|luma_norm)
                                 # exactly like the "shapes" entry above —
                                 # a luma_norm config must NOT silently train
                                 # on white-on-black masks
                                 grayscale=d.gray_mode,
                                 holdout=list(d.holdout) or None,
                                 background=d.background),
        "shapes_bbox": dict(img_size=d.img_size,
                            holdout=list(d.holdout) or None),
        "toy2d": dict(up=True),
        "cifar10": dict(classes=d.classes, data_dir=d.data_dir),
    }.get(d.dataset)
    if kw is None:
        raise ValueError(f"unknown dataset {d.dataset!r}")
    out = data_lib.get_dataset(d.dataset, key, d.n, **kw)
    return out[0], tuple(out[1:]) if d.dataset != "toy2d" else ()


def init_params(cfg: Config, model, key):
    m, d = cfg.model, cfg.data
    if m.kind in ("unet", "dit"):
        x = jnp.zeros((1, d.img_size, d.img_size, m.in_channels))
        labels = tuple(jnp.zeros((1,), jnp.int32) for _ in m.num_classes)
        return model.init(key, x, jnp.ones((1,)), *labels)
    if m.kind == "mlp":
        return model.init(key, jnp.ones((1, 1)), jnp.zeros((1, m.latent_dim)))
    labels = tuple(jnp.zeros((1,), jnp.int32) for _ in m.num_classes)
    return model.init(key, jnp.ones((1,)), jnp.zeros((1, m.latent_dim)),
                      *labels)


def add_runtime_flags(ap) -> None:
    """--profile / --debug_nans / --cpu on every entry point (SURVEY.md
    §5.1/§5.2)."""
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler Perfetto trace of the run "
                         "into outputs/profile")
    ap.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans (fail fast on NaN/Inf)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize overrides the "
                         "JAX_PLATFORMS env var, so this flips jax.config "
                         "after import — useful when the TPU tunnel is down)")


def apply_runtime_flags(args) -> None:
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    if getattr(args, "profile", False):
        import atexit
        os.makedirs("outputs/profile", exist_ok=True)
        jax.profiler.start_trace("outputs/profile")
        atexit.register(jax.profiler.stop_trace)


def require_accelerator(retries: int = 3, timeout_s: float = 60.0) -> None:
    """Fail fast when the tunneled TPU is unreachable (same probe as
    bench.py): a DEAD-BUT-CONNECTED tunnel blocks the first device op
    FOREVER and poisons the backend-init lock — a measurement script that
    skips this check hangs silently with zero CPU use (observed r4). Probe
    in a killable subprocess with bounded retries before any device work."""
    import time as _time

    from __graft_entry__ import _safe_compute_probe, _safe_device_count

    for attempt in range(retries):
        # device enumeration AND a real dispatch (a degraded tunnel passes
        # the former while hanging the latter forever — observed r4)
        if (_safe_device_count(timeout_s=timeout_s)
                and _safe_compute_probe()):
            # probes can pass and the NEXT in-process dispatch still hang
            # (observed r4) — arm the stall watchdog for the job itself
            start_stall_watchdog()
            return
        print(f"# device probe {attempt + 1}/{retries} failed; retrying "
              "in 20 s", file=sys.stderr)
        _time.sleep(20)
    print("FATAL: no usable accelerator backend — the TPU tunnel is down "
          "(environmental). Re-run when it recovers, or pass --cpu.",
          file=sys.stderr)
    sys.exit(3)


def start_stall_watchdog(idle_limit_s: float = 600.0,
                         check_every_s: float = 60.0,
                         min_cpu_delta_s: float = 1.0) -> None:
    """Kill this process (exit 42) when it stops making progress.

    The degraded tunnel's failure mode is an INDEFINITE block inside a C
    dispatch call — not an exception — so no in-thread handling can
    recover; the process sits at zero CPU forever and a wall-clock timeout
    wastes the whole budget. A daemon thread samples the process CPU time
    (os.times): a healthy measurement job accrues host CPU continuously
    (dispatch, compile, data prep; even device-bound phases wake between
    scan chunks), a hung one accrues none. If CPU advances less than
    ``min_cpu_delta_s`` over ``idle_limit_s``, os._exit(42) — which works
    even while the main thread is stuck in native code — and the
    tpu_retry.sh wrapper relaunches."""
    import threading

    def run():
        import time as _t
        last = sum(os.times()[:2])
        idle = 0.0
        while True:
            _t.sleep(check_every_s)
            cur = sum(os.times()[:2])
            if cur - last < min_cpu_delta_s:
                idle += check_every_s
                if idle >= idle_limit_s:
                    print(f"[stall-watchdog] no CPU progress for "
                          f"{idle:.0f}s — device dispatch presumed hung; "
                          "exiting 42 for the retry wrapper", flush=True)
                    os._exit(42)
            else:
                idle = 0.0
            last = cur

    threading.Thread(target=run, daemon=True,
                     name="stall-watchdog").start()
