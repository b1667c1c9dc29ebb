"""Model-zoo tests: shapes, conditioning, expert stacking exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from composable_diffusion_models_tpu import experts
from composable_diffusion_models_tpu.models import (BetaVAE, LatentDiffusionMLP,
                                                    ScoreMLP, UNet, vae_loss)

TINY = dict(base_dim=8, channel_mults=(1, 2, 4))


@pytest.mark.parametrize("size,ch", [(28, 1), (64, 3)])
def test_unet_shape(key, size, ch):
    m = UNet(in_channels=ch, **TINY)
    x = jnp.zeros((2, size, size, ch))
    t = jnp.ones((2,))
    p = m.init(key, x, t)
    assert m.apply(p, x, t).shape == (2, size, size, ch)


def test_unet_pad_to_canvas(key):
    """pad_to computes on an 8-aligned canvas but keeps the 28x28 interface
    and the exact param tree of the unpadded model (checkpoints load across
    both settings)."""
    m28 = UNet(in_channels=1, **TINY)
    m32 = UNet(in_channels=1, pad_to=32, **TINY)
    x = jax.random.normal(key, (2, 28, 28, 1))
    t = jnp.ones((2,))
    p28 = m28.init(key, x, t)
    p32 = m32.init(key, x, t)
    assert (jax.tree_util.tree_structure(p28)
            == jax.tree_util.tree_structure(p32))
    for a, b in zip(jax.tree_util.tree_leaves(p28),
                    jax.tree_util.tree_leaves(p32)):
        assert a.shape == b.shape
    out = m32.apply(p28, x, t)
    assert out.shape == (2, 28, 28, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # already-square-at-canvas input passes through unpadded
    x32 = jax.random.normal(key, (2, 32, 32, 1))
    assert m32.apply(p32, x32, t).shape == (2, 32, 32, 1)


def test_unet_deep_variant(key):
    # src SimpleUnet depth (SURVEY M4): 4 levels + bottleneck
    m = UNet(in_channels=3, base_dim=4, channel_mults=(1, 2, 4, 8, 16))
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(key, x, jnp.ones((1,)))
    assert m.apply(p, x, jnp.ones((1,))).shape == (1, 32, 32, 3)


def test_unet_time_sensitivity(key):
    m = UNet(in_channels=1, **TINY)
    x = jax.random.normal(key, (1, 28, 28, 1))
    p = m.init(key, x, jnp.ones((1,)))
    a = m.apply(p, x, jnp.full((1,), 0.1))
    b = m.apply(p, x, jnp.full((1,), 0.9))
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4


def test_unet_label_conditioning(key):
    m = UNet(in_channels=1, num_classes=(3,), **TINY)
    x = jax.random.normal(key, (2, 28, 28, 1))
    t = jnp.ones((2,))
    lab0 = jnp.zeros((2,), jnp.int32)
    lab1 = jnp.ones((2,), jnp.int32)
    p = m.init(key, x, t, lab0)
    a, b = m.apply(p, x, t, lab0), m.apply(p, x, t, lab1)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4


def test_unet_null_token_slot(key):
    m = UNet(in_channels=1, num_classes=(3,), null_token=True, **TINY)
    x = jnp.zeros((1, 28, 28, 1))
    t = jnp.ones((1,))
    p = m.init(key, x, t, jnp.zeros((1,), jnp.int32))
    # label == num_classes is the reserved null row, must not crash
    out = m.apply(p, x, t, jnp.full((1,), 3, jnp.int32))
    assert out.shape == (1, 28, 28, 1)


def test_unet_cross_attention(key):
    m = UNet(in_channels=3, num_classes=(10, 3), null_token=True,
             cross_attn=True, **TINY)
    x = jax.random.normal(key, (2, 28, 28, 3))
    t = jnp.ones((2,))
    d = jnp.zeros((2,), jnp.int32)
    c = jnp.ones((2,), jnp.int32)
    p = m.init(key, x, t, d, c)
    a = m.apply(p, x, t, d, c)
    b = m.apply(p, x, t, jnp.full((2,), 5, jnp.int32), c)
    assert a.shape == (2, 28, 28, 3)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5


def test_score_mlp_time_broadcast(key):
    m = ScoreMLP(hidden=32, depth=2, out_dim=2)
    x = jax.random.normal(key, (4, 2))
    p = m.init(key, jnp.ones((4, 1)), x)
    a = m.apply(p, jnp.full((4,), 0.5), x)
    b = m.apply(p, jnp.full((4, 1), 0.5), x)
    c = m.apply(p, jnp.asarray(0.5), x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_latent_mlp_cfg_slots(key):
    m = LatentDiffusionMLP(latent_dim=4, hidden=32, depth=2,
                           num_classes=(5, 3), null_token=True)
    z = jax.random.normal(key, (2, 4))
    p = m.init(key, jnp.ones((2,)), z, jnp.zeros((2,), jnp.int32),
               jnp.zeros((2,), jnp.int32))
    out = m.apply(p, jnp.ones((2,)), z, jnp.full((2,), 5, jnp.int32),
                  jnp.full((2,), 3, jnp.int32))
    assert out.shape == (2, 4)


def test_expert_stack_matches_individual(key):
    m = UNet(in_channels=1, base_dim=4, channel_mults=(1, 2))
    x = jax.random.normal(key, (2, 8, 8, 1))
    t = jnp.ones((2,))
    ps = [m.init(jax.random.fold_in(key, i), x, t) for i in range(3)]
    stack = experts.ExpertStack(m.apply, ps)
    out = stack(x, t)
    assert out.shape[0] == 3
    for i, p in enumerate(ps):
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(m.apply(p, x, t)), atol=1e-5)


def test_expert_stack_per_expert_labels(key):
    m = UNet(in_channels=1, base_dim=4, channel_mults=(1, 2),
             num_classes=(3,))
    x = jax.random.normal(key, (2, 8, 8, 1))
    t = jnp.ones((2,))
    lab = jnp.zeros((2,), jnp.int32)
    ps = [m.init(jax.random.fold_in(key, i), x, t, lab) for i in range(2)]
    stack = experts.ExpertStack(m.apply, ps)
    lab_ke = jnp.array([[0, 0], [2, 2]], jnp.int32)  # (K, B)
    out = stack(x, t, experts.per_expert(lab_ke))
    np.testing.assert_allclose(
        np.asarray(out[1]),
        np.asarray(m.apply(ps[1], x, t, lab_ke[1])), atol=1e-5)
    # a bare (K, B) array is ambiguous and must be rejected, not guessed at
    with pytest.raises(ValueError, match="ambiguous"):
        stack(x, t, lab_ke)


def test_expert_stack_broadcast_label_when_b_equals_k(key):
    """(B,) labels with B == K broadcast to every expert — the old ndim
    heuristic got this right only by check order (VERDICT r1 weak-5)."""
    m = UNet(in_channels=1, base_dim=4, channel_mults=(1, 2),
             num_classes=(3,))
    x = jax.random.normal(key, (2, 8, 8, 1))     # B == K == 2
    t = jnp.ones((2,))
    lab = jnp.array([1, 2], jnp.int32)           # (B,) data label
    ps = [m.init(jax.random.fold_in(key, i), x, t, lab) for i in range(2)]
    stack = experts.ExpertStack(m.apply, ps)
    out = stack(x, t, lab)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(m.apply(ps[i], x, t, lab)),
            atol=1e-5)


def test_grouped_heterogeneous_experts(key):
    g_model = UNet(in_channels=1, base_dim=4, channel_mults=(1, 2))
    c_model = UNet(in_channels=3, base_dim=4, channel_mults=(1, 2))
    xg = jnp.zeros((3, 8, 8, 1))
    xc = jnp.zeros((3, 8, 8, 3))
    t = jnp.ones((3,))
    gp = g_model.init(key, xg, t)
    cp = c_model.init(key, xc, t)
    gs = experts.ExpertStack(g_model.apply, [gp])
    cs = experts.ExpertStack(c_model.apply, [cp])
    fn = experts.grouped_eps_fn(
        [lambda x, tt: gs(x, tt), lambda x, tt: cs(x, tt)],
        adapters=[experts.rgb_to_gray, lambda x: x],
        lifts=[experts.gray_to_rgb, lambda e: e])
    x_in = jax.random.normal(key, (3, 8, 8, 3))
    out = fn(x_in, t)
    # B=3 != K=2 so a transposed (B, K, ...) regression cannot pass
    assert out.shape == (2, 3, 8, 8, 3)
    # group 1 is the identity-adapted color expert: row 1 of the stack must
    # equal its direct forward (pins stack ORDER, not just shape)
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(c_model.apply(cp, x_in, t)),
                               atol=1e-5)


def test_rgb_gray_roundtrip_shapes(key):
    x = jax.random.normal(key, (2, 8, 8, 3))
    g = experts.rgb_to_gray(x)
    assert g.shape == (2, 8, 8, 1)
    assert experts.gray_to_rgb(g).shape == (2, 8, 8, 3)


def test_grouped_eps_fn_rejects_mismatched_adapters():
    # zip truncation would silently drop expert groups from the blend
    with pytest.raises(ValueError, match="adapters"):
        experts.grouped_eps_fn(
            [lambda x, t: x, lambda x, t: x],
            adapters=[lambda x: x])


def test_sinusoidal_embedding_validates_dim():
    from composable_diffusion_models_tpu.models.embeddings import (
        sinusoidal_embedding)
    t = jnp.ones((2,))
    assert sinusoidal_embedding(t, 8).shape == (2, 8)
    for bad in (2, 7):  # dim=2 -> 0/0 NaN embedding; odd -> silently narrower
        with pytest.raises(ValueError, match="even"):
            sinusoidal_embedding(t, bad)


def test_gray_lift_adjoint(key):
    """gray_to_rgb(normalized=True) is the exact adjoint of the unit-norm
    luma projection: <lift(g), x> == <g, P x> and P(lift(g)) == g (unit
    gain) — the invariants the projection-substitution protocol needs."""
    import numpy as np
    x = jax.random.normal(key, (2, 8, 8, 3))
    g = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    px = experts.rgb_to_gray(x, normalized=True)
    lg = experts.gray_to_rgb(g, normalized=True)
    np.testing.assert_allclose(float((lg * x).sum()), float((g * px).sum()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(experts.rgb_to_gray(
        lg, normalized=True)), np.asarray(g), rtol=1e-4, atol=1e-5)
    # equal broadcast is NOT unit-gain under the normalized projection
    # (luma component scaled by sum(w)/||w|| = 1.49) — the bug the adjoint
    # lift fixes for --gray_norm avg/ito/cfg composition
    b = experts.rgb_to_gray(experts.gray_to_rgb(g), normalized=True)
    assert abs(float(jnp.mean(b / g)) - 1.494) < 0.01


def test_gray_lift_adjoint_custom_weights(key):
    """The adjoint invariants of test_gray_lift_adjoint hold for the
    equal-weight projection too (--gray_proj equal: luma gives the gray
    expert authority only 0.17 over blue; equal weights give 0.577 per
    channel), and the two projections genuinely differ on chroma."""
    import numpy as np
    w_eq = (1.0, 1.0, 1.0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    g = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    px = experts.rgb_to_gray(x, normalized=True, weights=w_eq)
    lg = experts.gray_to_rgb(g, normalized=True, weights=w_eq)
    np.testing.assert_allclose(float((lg * x).sum()), float((g * px).sum()),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(experts.rgb_to_gray(lg, normalized=True, weights=w_eq)),
        np.asarray(g), rtol=1e-4, atol=1e-5)
    # equal projection weights blue at 1/sqrt(3), luma at 0.114/||w_luma||
    blue = jnp.zeros((1, 1, 1, 3)).at[..., 2].set(1.0)
    eq_b = float(experts.rgb_to_gray(blue, normalized=True,
                                     weights=w_eq)[0, 0, 0, 0])
    luma_b = float(experts.rgb_to_gray(blue, normalized=True)[0, 0, 0, 0])
    assert abs(eq_b - 1 / 3 ** 0.5) < 1e-6
    assert luma_b < 0.2 < eq_b


def test_projected_custom_proj(key):
    """compose.projected(proj=(1,1,1)) substitutes along the equal-weight
    row space: the projected component equals eps_sub, the orthogonal
    complement is untouched (same invariant the luma default is tested
    for, on the gray_proj-equal axis)."""
    import numpy as np
    from composable_diffusion_models_tpu import compose
    w = jnp.ones((3,)) / jnp.sqrt(3.0)
    e_full = jax.random.normal(key, (2, 4, 4, 3))
    e_sub = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 1))
    out = compose.projected(e_full, e_sub, 1.0, proj=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray((out * w).sum(-1, keepdims=True)),
        np.asarray(e_sub), rtol=1e-4, atol=1e-5)
    ortho = out - (out * w).sum(-1, keepdims=True) * w
    ortho_full = e_full - (e_full * w).sum(-1, keepdims=True) * w
    np.testing.assert_allclose(np.asarray(ortho), np.asarray(ortho_full),
                               rtol=1e-4, atol=1e-5)


def test_luma_weights_single_source():
    """The ITU-601 luma weights live in exactly one place (compose.LUMA_W);
    data's luma_norm images must equal rgb_to_gray(normalized=True) of the
    RGB images so 'the subspace expert estimates exactly P eps' holds."""
    import numpy as np
    from composable_diffusion_models_tpu import compose, data
    rgb, s, c = data.make_shapes_dataset(6, 16)
    luma_n, s2, c2 = data.make_shapes_dataset(6, 16, grayscale="luma_norm")
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
    np.testing.assert_allclose(
        np.asarray(experts.rgb_to_gray(rgb, normalized=True)),
        np.asarray(luma_n), atol=1e-5)
    assert len(compose.LUMA_W) == 3


def test_vae_roundtrip(key):
    vae = BetaVAE(img_size=28, latent_dim=6)
    x = jnp.clip(jax.random.uniform(key, (2, 28, 28, 1)), 0, 1)
    p = vae.init(key, x, key)
    recon, mu, lv = vae.apply(p, x, key)
    assert recon.shape == x.shape and mu.shape == (2, 6)
    loss = vae_loss(recon, x, mu, lv, beta=4.0)
    assert bool(jnp.isfinite(loss))
    z = vae.apply(p, mu, method=BetaVAE.decode)
    assert z.shape == x.shape


class TestDiT:
    """Diffusion-transformer backbone (models/dit.py, beyond-reference):
    same apply(params, x, t, *labels) contract as UNet so the whole
    sampler/composition stack is architecture-agnostic."""

    def _model(self, **kw):
        from composable_diffusion_models_tpu.models import DiT
        cfg = dict(patch=4, dim=64, depth=2, n_heads=4, in_channels=1)
        cfg.update(kw)
        return DiT(**cfg)

    def test_shape_and_adaln_zero_init(self, key):
        model = self._model()
        x = jax.random.normal(key, (2, 28, 28, 1))
        params = model.init(key, x, jnp.ones((2,)))
        out = model.apply(params, x, jnp.ones((2,)))
        assert out.shape == x.shape
        # adaLN-Zero: the network is exactly the zero function at init
        # (zero-init final projection), the stability property the DiT
        # paper pins for deep stacks
        assert float(jnp.abs(out).max()) == 0.0

    def test_label_conditioning_changes_output_after_training_step(self, key):
        from composable_diffusion_models_tpu import train
        from composable_diffusion_models_tpu.schedules import VPSchedule
        model = self._model(num_classes=(3,), null_token=True)
        x = jax.random.normal(key, (4, 28, 28, 1))
        lab = jnp.zeros((4,), jnp.int32)
        params = model.init(key, x, jnp.ones((4,)), lab)
        # TWO grad steps: the zero-init unpatchify blocks all conditioning
        # gradients for exactly one step (out = 0-kernel @ tokens, so
        # d out / d modulation = 0 at init); step 1 makes unpatchify nonzero,
        # step 2 propagates into the adaLN conditioning — labels then matter
        loss_fn = train.make_loss_fn(model.apply, VPSchedule())
        for i in range(2):
            g = jax.grad(loss_fn)(params, jax.random.fold_in(key, i), x,
                                  (lab,))
            params = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg,
                                            params, g)
        out0 = model.apply(params, x, jnp.ones((4,)), lab)
        out1 = model.apply(params, x, jnp.ones((4,)), lab + 1)
        assert float(jnp.abs(out0 - out1).max()) > 1e-6
        # null row reachable (CFG contract): label == num_classes
        out_null = model.apply(params, x, jnp.ones((4,)),
                               jnp.full((4,), 3, jnp.int32))
        assert out_null.shape == x.shape

    def test_patch_divisibility_enforced(self, key):
        model = self._model(patch=8)
        x = jnp.zeros((1, 28, 28, 1))
        with pytest.raises(ValueError, match="divisible"):
            model.init(key, x, jnp.ones((1,)))

    def test_trains_and_samples_end_to_end(self, key):
        """DSM loss decreases and DDIM consumes the DiT closure unchanged."""
        from composable_diffusion_models_tpu import samplers, train
        from composable_diffusion_models_tpu.schedules import VPSchedule
        model = self._model(patch=4, dim=32, depth=1, n_heads=2)
        sch = VPSchedule()
        x0 = jax.random.normal(key, (64, 8, 8, 1)) * 0.5
        params = model.init(key, x0[:1], jnp.ones((1,)))
        params, losses = train.train_expert(
            key, model.apply, params, sch, x0, (), steps=60, batch_size=32,
            lr=2e-3)
        assert float(losses[-10:].mean()) < float(losses[:10].mean())
        out = samplers.ddim(lambda x, t: model.apply(params, x, t),
                            sch, jax.random.normal(key, (4, 8, 8, 1)), 10)
        assert out.shape == (4, 8, 8, 1)


class TestFusedQKVAttention:
    """models.dit.FusedQKVAttention — the one-GEMM attention path for short
    token sequences (profile_dit.py A/B candidate for the headline DiT)."""

    def test_matches_stock_mhdpa_with_transplanted_params(self, key):
        """Exact math parity: folding the stock MHDPA's q/k/v/out kernels
        into the fused layout reproduces its output bit-for-bit in fp32
        (same scale convention 1/sqrt(head_dim), same head flattening)."""
        from composable_diffusion_models_tpu.models.dit import (
            FusedQKVAttention)
        d, heads, hd = 32, 4, 8
        x = jax.random.normal(key, (2, 5, d))
        mh = nn.MultiHeadDotProductAttention(num_heads=heads)
        mp = mh.init(key, x, x)["params"]
        ref = mh.apply({"params": mp}, x, x)

        def flat_in(k):  # (d, heads, hd) -> (d, heads*hd)
            return mp[k]["kernel"].reshape(d, heads * hd)

        qkv_kernel = jnp.concatenate(
            [flat_in("query"), flat_in("key"), flat_in("value")], axis=1)
        qkv_bias = jnp.concatenate(
            [mp[k]["bias"].reshape(heads * hd) for k in
             ("query", "key", "value")])
        fused_params = {"params": {
            "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
            "proj": {"kernel": mp["out"]["kernel"].reshape(heads * hd, d),
                     "bias": mp["out"]["bias"]},
        }}
        fa = FusedQKVAttention(dim=d, n_heads=heads)
        out = fa.apply(fused_params, x)
        assert jnp.allclose(out, ref, atol=1e-5), (
            float(jnp.abs(out - ref).max()))

    def test_dit_qkv_fused_flag_end_to_end(self, key):
        """The qkv_fused DiT keeps the adaLN-Zero init property and the
        apply contract (shape-preserving, zero at init)."""
        from composable_diffusion_models_tpu.models import DiT
        model = DiT(patch=4, dim=64, depth=2, n_heads=4, in_channels=1,
                    qkv_fused=True)
        x = jax.random.normal(key, (2, 28, 28, 1))
        params = model.init(key, x, jnp.ones((2,)))
        out = model.apply(params, x, jnp.ones((2,)))
        assert out.shape == x.shape
        assert float(jnp.abs(out).max()) == 0.0


class TestFoldedDiT:
    """models.dit.make_folded_apply — the r4 serving fast path: batch-constant
    adaLN modulation folded into per-step GEMM weights, patchify as GEMM
    (VERDICT r3 item 1). Math parity with DiT.apply on the SAME param tree is
    the property that lets quality-gate verdicts carry over."""

    @staticmethod
    def _randomized(key, model, x):
        """init, then replace every param with random values — the zero-init
        modulation/head weights would otherwise make parity trivially true."""
        params = model.init(key, x[:1], jnp.ones((1,)))
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        leaves = [jax.random.normal(k, a.shape, a.dtype) * 0.2
                  for k, a in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @pytest.mark.parametrize("fused", [True, False])
    def test_fp32_parity_both_param_layouts(self, key, fused):
        """Folded output == stock apply on both the FusedQKVAttention and the
        stock-MHDPA checkpoint layouts (fp32, tight tolerance)."""
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        model = DiT(patch=7, dim=64, depth=2, n_heads=4, in_channels=1,
                    qkv_fused=fused)
        x = jax.random.normal(key, (3, 28, 28, 1))
        params = self._randomized(key, model, x)
        t = jnp.full((1,), 0.37)
        ref = model.apply(params, x, t)
        out = make_folded_apply(model)(params, x, t)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-4, err

    def test_bf16_parity(self, key):
        """bf16 compute path (the bench configuration): rounding sites move
        (weight-side vs activation-side modulation; fp32 softmax in both),
        so parity is within a few bf16 ulps of the activation scale."""
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        model = DiT(patch=7, dim=64, depth=2, n_heads=4, in_channels=1,
                    qkv_fused=True, dtype=jnp.bfloat16)
        x = jax.random.normal(key, (3, 28, 28, 1))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            self._randomized(key, model, x))
        t = jnp.full((1,), 0.37)
        ref = model.apply(params, x, t)
        out = make_folded_apply(model)(params, x, t)
        denom = float(jnp.abs(ref).max()) + 1e-6
        rel = float(jnp.abs(out - ref).max()) / denom
        assert rel < 0.05, rel

    def test_conditional_batch1_labels(self, key):
        """Batch-constant labels fold; per-sample labels are rejected with a
        pointer to DiT.apply."""
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        model = DiT(patch=7, dim=64, depth=2, n_heads=4, in_channels=1,
                    num_classes=(3, 4), qkv_fused=True)
        x = jax.random.normal(key, (2, 28, 28, 1))
        lab = (jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32))
        params = model.init(key, x[:1], jnp.ones((1,)), *lab)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        params = jax.tree_util.tree_unflatten(treedef, [
            jax.random.normal(k, a.shape, a.dtype) * 0.2
            for k, a in zip(keys, leaves)])
        t = jnp.full((1,), 0.5)
        ref = model.apply(params, x, t, *lab)
        out = make_folded_apply(model)(params, x, t, *lab)
        assert float(jnp.abs(out - ref).max()) < 1e-4
        with pytest.raises(ValueError, match="batch-constant"):
            make_folded_apply(model)(params, x, t,
                                     jnp.zeros((2,), jnp.int32), lab[1])

    def test_adaln_zero_at_init(self, key):
        """Folded path preserves the adaLN-Zero property: output is exactly
        zero at initialization."""
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        model = DiT(patch=4, dim=32, depth=2, n_heads=2, in_channels=1,
                    qkv_fused=True)
        x = jax.random.normal(key, (2, 28, 28, 1))
        params = model.init(key, x[:1], jnp.ones((1,)))
        out = make_folded_apply(model)(params, x, jnp.full((1,), 0.5))
        assert float(jnp.abs(out).max()) == 0.0

    def test_expert_stack_and_ddim_consume_it(self, key):
        """ExpertStack + the jitted DDIM scan run the folded apply unchanged
        (the bench program shape)."""
        from composable_diffusion_models_tpu import (compose, experts,
                                                     samplers)
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        from composable_diffusion_models_tpu.schedules import VPSchedule
        model = DiT(patch=7, dim=32, depth=1, n_heads=2, in_channels=1,
                    qkv_fused=True)
        x0 = jnp.zeros((1, 28, 28, 1))
        params_list = [model.init(jax.random.fold_in(key, i), x0,
                                  jnp.ones((1,))) for i in range(3)]
        stack = experts.ExpertStack(make_folded_apply(model), params_list)
        w = jnp.ones((3,), jnp.float32)

        def eps_fn(x, t):
            return compose.weighted(stack(x, t), w)

        out = jax.jit(lambda k: samplers.ddim(
            eps_fn, VPSchedule(),
            jax.random.normal(k, (4, 28, 28, 1)), 8))(key)
        assert out.shape == (4, 28, 28, 1)
        assert bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
    def test_fold_ln_parity(self, key, dtype):
        """fold_ln (LN normalization as GEMM epilogue) matches the
        materialized-LN folded path and stock apply in fp32; under bf16 the
        raw-stream GEMM accumulates fp32 (preferred_element_type) and stays
        within bf16 tolerance of stock."""
        from composable_diffusion_models_tpu.models import (DiT,
                                                            make_folded_apply)
        model = DiT(patch=7, dim=64, depth=2, n_heads=4, in_channels=1,
                    qkv_fused=True, dtype=dtype)
        x = jax.random.normal(key, (3, 28, 28, 1))
        params = self._randomized(key, model, x)
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype), params)
        t = jnp.full((1,), 0.37)
        ref = model.apply(params, x, t)
        out = make_folded_apply(model, fold_ln=True)(params, x, t)
        denom = float(jnp.abs(ref).max()) + 1e-6
        rel = float(jnp.abs(out - ref).max()) / denom
        assert rel < (0.05 if dtype is not None else 2e-5), rel
