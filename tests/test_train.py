"""Training-loop tests: loss decreases, CFG dropout path, eval hooks."""

import jax
import jax.numpy as jnp
import numpy as np

from composable_diffusion_models_tpu import data, train
from composable_diffusion_models_tpu.models import ScoreMLP, UNet
from composable_diffusion_models_tpu.schedules import DDPMSchedule, VPSchedule


def test_mlp_loss_decreases_continuous(key):
    sch = VPSchedule()
    m = ScoreMLP(hidden=64, depth=2, out_dim=2)
    pts = data.toy2d(key, 2048, up=True)
    p = m.init(key, jnp.ones((4, 1)), jnp.zeros((4, 2)))
    p, losses = train.train_expert(
        key, m.apply, p, sch, pts, steps=300, batch_size=256, lr=2e-3,
        time_first=True, steps_per_scan=100)
    assert float(losses[-20:].mean()) < float(losses[:20].mean()) * 0.8


def test_unet_loss_decreases_discrete(key):
    sde = DDPMSchedule(num_timesteps=100)
    m = UNet(in_channels=1, base_dim=8, channel_mults=(1, 2))
    imgs, _ = data.synthetic_mnist(key, 256, classes=[0])
    imgs = imgs * 2 - 1
    p = m.init(key, jnp.zeros((1, 28, 28, 1)), jnp.ones((1,)))
    p, losses = train.train_expert(
        key, m.apply, p, sde, imgs, steps=60, batch_size=32, lr=1e-3,
        steps_per_scan=30)
    assert float(losses[-10:].mean()) < float(losses[:10].mean())


def test_cfg_null_dropout_runs(key):
    sch = VPSchedule()
    m = UNet(in_channels=1, base_dim=8, channel_mults=(1, 2),
             num_classes=(3,), null_token=True)
    imgs, labels = data.synthetic_mnist(key, 64, classes=[0, 1, 2])
    imgs = imgs * 2 - 1
    p = m.init(key, jnp.zeros((1, 28, 28, 1)), jnp.ones((1,)),
               jnp.zeros((1,), jnp.int32))
    p, losses = train.train_expert(
        key, m.apply, p, sch, imgs, labels=(labels,), steps=10,
        batch_size=16, uncond_prob=0.1, null_labels=(3,), steps_per_scan=10)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_one_step_denoise_val(key):
    sch = VPSchedule()
    m = UNet(in_channels=1, base_dim=8, channel_mults=(1, 2))
    p = m.init(key, jnp.zeros((1, 28, 28, 1)), jnp.ones((1,)))
    out = train.one_step_denoise_val(m.apply, p, sch, key, (4, 28, 28, 1))
    assert out.shape == (4, 28, 28, 1)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_min_snr_weighting_formula(key):
    """min-SNR-gamma (Hang et al. 2023): the weighted loss of a zero
    predictor is pinned EXACTLY against a reimplementation of the closed
    form mean(min(SNR,g)/SNR * per-sample mean eps^2), replicating the loss
    fn's own PRNG splits so t and eps match bitwise."""
    sch = VPSchedule()
    gamma = 5.0
    x0 = jnp.zeros((64, 4, 4, 1))
    zero = lambda p, x, t: jnp.zeros_like(x)
    lw = train.make_loss_fn(zero, sch, snr_gamma=gamma)(None, key, x0)

    # replicate make_loss_fn's internal draws (split order is part of the
    # bitwise-resume contract, so this is stable by design)
    kt, ke, kd = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (64,), minval=1e-3, maxval=1.0)
    _, eps = sch.q_t(ke, x0, t)
    snr = (sch.alpha(t) / sch.sigma(t)) ** 2
    w = jnp.minimum(snr, gamma) / snr
    expected = jnp.mean(w * jnp.mean(eps.reshape(64, -1) ** 2, axis=1))
    np.testing.assert_allclose(float(lw), float(expected), rtol=1e-5)

    # the weighting must strictly downweight vs the unweighted loss (the
    # high-SNR small-t region is the regime it exists for)
    lu = train.make_loss_fn(zero, sch)(None, key, x0)
    assert float(lw) < float(lu)
    import pytest
    with pytest.raises(ValueError, match="predict"):
        train.make_loss_fn(zero, sch, predict="nope", snr_gamma=gamma)


def test_resume_bitwise_identical(key, tmp_path):
    """Fault-injection (SURVEY.md §5.3): kill training mid-run, resume from
    the step checkpoint, and get BITWISE the same params as an uninterrupted
    run with the same key."""
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager

    sch = VPSchedule()
    m = ScoreMLP(hidden=16)
    x = data.toy2d(key, 128)
    p0 = m.init(key, jnp.ones((1,)), jnp.zeros((1, 2)))

    def mgr(sub):
        return CheckpointManager(str(tmp_path / sub), "exp")

    # uninterrupted: 4 chunks of 10
    p_full, _ = train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr("a"), "mlp", steps=40, batch_size=32,
        steps_per_scan=10, time_first=True)

    # interrupted: run 2 chunks, "crash", then resume to 4 with a FRESH
    # initialization (must be ignored in favor of the checkpoint)
    m_b = mgr("b")
    train.train_expert_resumable(
        key, m.apply, p0, sch, x, m_b, "mlp", steps=20, batch_size=32,
        steps_per_scan=10, time_first=True)
    assert m_b.step_list("mlp") == [10, 20]
    p_fresh = m.init(jax.random.fold_in(key, 999), jnp.ones((1,)),
                     jnp.zeros((1, 2)))
    p_resumed, _ = train.train_expert_resumable(
        key, m.apply, p_fresh, sch, x, m_b, "mlp", steps=40, batch_size=32,
        steps_per_scan=10, time_first=True)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_resumed)):
        assert jnp.array_equal(a, b), "resume diverged from straight run"


def test_resume_from_remainder_chunk_is_noop(key, tmp_path):
    """Restoring from the checkpoint of a REMAINDER chunk (steps not a
    multiple of steps_per_scan) must not re-run it: resume from a complete
    25-step run (chunks 10/10/5) returns the restored params bitwise with
    zero new losses (the old chunk-index skip re-ran the 5-step chunk,
    over-training to 30 steps)."""
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager

    sch = VPSchedule()
    m = ScoreMLP(hidden=16)
    x = data.toy2d(key, 128)
    p0 = m.init(key, jnp.ones((1,)), jnp.zeros((1, 2)))
    mgr = CheckpointManager(str(tmp_path), "exp")

    p_full, losses_full = train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr, "mlp", steps=25, batch_size=32,
        steps_per_scan=10, time_first=True)
    assert losses_full.shape == (25,)
    assert mgr.step_list("mlp")[-1] == 25

    p_again, losses_again = train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr, "mlp", steps=25, batch_size=32,
        steps_per_scan=10, time_first=True)
    assert losses_again.shape == (0,), "complete run must not re-train"
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_again)):
        assert jnp.array_equal(a, b)

    # and a mid-run restore from the 20-step checkpoint runs ONLY the
    # 5-step remainder, matching the uninterrupted run bitwise
    mgr2 = CheckpointManager(str(tmp_path / "b"), "exp")
    train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr2, "mlp", steps=20, batch_size=32,
        steps_per_scan=10, time_first=True)
    p_resumed, losses_tail = train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr2, "mlp", steps=25, batch_size=32,
        steps_per_scan=10, time_first=True)
    assert losses_tail.shape == (5,)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_resumed)):
        assert jnp.array_equal(a, b)


def test_resume_bitwise_identical_with_ema(key, tmp_path):
    """EMA rides the step checkpoints: a killed-and-resumed EMA run returns
    bitwise the same EMA tree as an uninterrupted one, and matches the
    non-resumable train_expert EMA contract (the flagship recipe's
    --resumable + ema_decay combination must not silently drop EMA)."""
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager

    sch = VPSchedule()
    m = ScoreMLP(hidden=16)
    x = data.toy2d(key, 128)
    p0 = m.init(key, jnp.ones((1,)), jnp.zeros((1, 2)))

    def mgr(sub):
        return CheckpointManager(str(tmp_path / sub), "exp")

    ema_full, _ = train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr("a"), "mlp", steps=40, batch_size=32,
        steps_per_scan=10, time_first=True, ema_decay=0.9)

    m_b = mgr("b")
    train.train_expert_resumable(
        key, m.apply, p0, sch, x, m_b, "mlp", steps=20, batch_size=32,
        steps_per_scan=10, time_first=True, ema_decay=0.9)
    ema_resumed, _ = train.train_expert_resumable(
        key, m.apply, p0, sch, x, m_b, "mlp", steps=40, batch_size=32,
        steps_per_scan=10, time_first=True, ema_decay=0.9)

    for a, b in zip(jax.tree_util.tree_leaves(ema_full),
                    jax.tree_util.tree_leaves(ema_resumed)):
        assert jnp.array_equal(a, b), "EMA resume diverged from straight run"

    # the resumable EMA must equal the NON-resumable train_expert EMA
    # bitwise (same key, same chunking, same per-step ema_update order)
    ema_te, _ = train.train_expert(
        key, m.apply, p0, sch, x, steps=40, batch_size=32,
        steps_per_scan=10, time_first=True, ema_decay=0.9)
    for a, b in zip(jax.tree_util.tree_leaves(ema_full),
                    jax.tree_util.tree_leaves(ema_te)):
        assert jnp.array_equal(a, b), \
            "resumable EMA != train_expert EMA contract"

    # and EMA is a trailing average, so it must differ from the raw params
    raw_np, _ = train.train_expert(
        key, m.apply, p0, sch, x, steps=40, batch_size=32,
        steps_per_scan=10, time_first=True)
    assert any(
        not jnp.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(ema_full),
                        jax.tree_util.tree_leaves(raw_np)))


def test_resume_with_ema_on_pre_ema_checkpoint_raises_actionably(key, tmp_path):
    """Step checkpoints written WITHOUT ema cannot be restored with
    ema_decay set — the failure must name the fix instead of surfacing an
    opaque orbax tree mismatch (the tunnel-outage recovery path)."""
    import pytest
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager

    sch = VPSchedule()
    m = ScoreMLP(hidden=16)
    x = data.toy2d(key, 128)
    p0 = m.init(key, jnp.ones((1,)), jnp.zeros((1, 2)))
    mgr = CheckpointManager(str(tmp_path), "exp")
    train.train_expert_resumable(
        key, m.apply, p0, sch, x, mgr, "mlp", steps=10, batch_size=32,
        steps_per_scan=10, time_first=True)  # no EMA in the checkpoint
    with pytest.raises(RuntimeError, match="ema_decay=0"):
        train.train_expert_resumable(
            key, m.apply, p0, sch, x, mgr, "mlp", steps=20, batch_size=32,
            steps_per_scan=10, time_first=True, ema_decay=0.9)


def test_save_step_keeps_latest_k(key, tmp_path):
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), "exp")
    state = {"w": jnp.ones((2,))}
    for s in (10, 20, 30, 40):
        mgr.save_step("m", state, s, keep=2)
    mgr.flush()  # saves are async: durability requires a flush
    # the in-flight step is excluded from the keep budget (pruning it away
    # could leave zero durable states on a crash mid-write), so after flush
    # `keep` durable + the just-written step remain
    assert mgr.step_list("m") == [20, 30, 40]
    restored, step = mgr.restore_latest("m", state)
    assert step == 40 and jnp.array_equal(restored["w"], state["w"])
    # next save prunes the now-durable backlog down to keep + in-flight
    mgr.save_step("m", state, 50, keep=2)
    mgr.flush()
    assert mgr.step_list("m") == [30, 40, 50]


def test_save_step_keep1_never_drops_last_durable(key, tmp_path):
    """keep=1 must never delete the previous durable checkpoint while the
    new save is still in flight (ADVICE r1): after every save there is at
    least one checkpoint that predates the in-flight write."""
    from composable_diffusion_models_tpu.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), "exp")
    state = {"w": jnp.ones((2,))}
    mgr.save_step("m", state, 1, keep=1, wait=True)
    mgr.save_step("m", state, 2, keep=1)  # async: 2 may still be writing
    assert 1 in mgr.step_list("m"), "durable step pruned under in-flight save"
    mgr.flush()
    mgr.save_step("m", state, 3, keep=1)
    mgr.flush()
    assert mgr.step_list("m") == [2, 3]


def test_ema_update_converges_to_params(key):
    p = {"w": jnp.zeros((4,))}
    target = {"w": jnp.ones((4,))}
    ema = p
    for _ in range(100):
        ema = train.ema_update(ema, target, decay=0.9)
    assert float(jnp.abs(ema["w"] - 1.0).max()) < 1e-4
    # jit/scan compatible
    def body(e, _):
        return train.ema_update(e, target, decay=0.9), None
    ema2, _ = jax.lax.scan(body, p, None, length=100)
    assert jnp.allclose(ema2["w"], ema["w"])


def test_train_expert_ema(key):
    """ema_decay returns the EMA tree: different from raw-final training but
    close after enough steps; finite; same treedef."""
    from composable_diffusion_models_tpu.models import ScoreMLP
    from composable_diffusion_models_tpu.schedules import VPSchedule

    m = ScoreMLP(hidden=16, depth=2, out_dim=2)
    p0 = m.init(key, jnp.ones((1, 1)), jnp.zeros((1, 2)))
    pts = jax.random.normal(key, (512, 2))
    raw, _ = train.train_expert(key, lambda p, t, x: m.apply(p, t, x), p0,
                                VPSchedule(), pts, steps=60, batch_size=64,
                                time_first=True, steps_per_scan=30)
    ema, losses = train.train_expert(key, lambda p, t, x: m.apply(p, t, x),
                                     p0, VPSchedule(), pts, steps=60,
                                     batch_size=64, time_first=True,
                                     steps_per_scan=30, ema_decay=0.9)
    assert bool(jnp.all(jnp.isfinite(losses)))
    raw_l = jax.tree_util.tree_leaves(raw)
    ema_l = jax.tree_util.tree_leaves(ema)
    assert len(raw_l) == len(ema_l)
    assert all(bool(jnp.all(jnp.isfinite(e))) for e in ema_l)
    # EMA lags the raw params but tracks them (decay 0.9, 60 steps)
    diffs = [float(jnp.abs(r - e).max()) for r, e in zip(raw_l, ema_l)]
    assert max(diffs) > 0.0
    assert max(diffs) < 1.0


def test_train_expert_clip_norm(key):
    """clip_norm plumbs global-norm clipping into the optimizer: training
    still converges with a sane clip, and an absurdly tight clip (1e-6)
    produces a DIFFERENT trajectory than no clip (proof the transform is
    in the chain — Adam is scale-invariant, so the divergence shows up in
    m/sqrt(v) warmup, not in frozen params). Motivated by a measured bf16
    divergence (the 64x64 DiT expert detonates at ~10-12k steps without
    clipping — quality_gate_shapes --clip_norm)."""
    from composable_diffusion_models_tpu.models import ScoreMLP
    from composable_diffusion_models_tpu.schedules import VPSchedule

    m = ScoreMLP(hidden=16, depth=2, out_dim=2)
    p0 = m.init(key, jnp.ones((1, 1)), jnp.zeros((1, 2)))
    pts = jax.random.normal(key, (512, 2))

    def run(**kw):
        return train.train_expert(
            key, lambda p, t, x: m.apply(p, t, x), p0, VPSchedule(), pts,
            steps=60, batch_size=64, time_first=True, steps_per_scan=30,
            **kw)

    clipped, losses = run(clip_norm=1.0)
    assert bool(jnp.all(jnp.isfinite(losses)))
    assert all(bool(jnp.all(jnp.isfinite(a))) for a in
               jax.tree_util.tree_leaves(clipped))
    unclipped, _ = run()
    tiny, tiny_losses = run(clip_norm=1e-6)
    assert bool(jnp.all(jnp.isfinite(tiny_losses)))
    d = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(tiny),
        jax.tree_util.tree_leaves(unclipped)))
    assert d > 1e-4, f"clip_norm had no effect on the trajectory ({d})"
