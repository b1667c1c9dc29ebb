"""Training-loop tests: loss decreases, CFG dropout path, eval hooks."""

import jax
import jax.numpy as jnp

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
