"""Compositional-generalization eval harness (eval.py)."""

import jax
import jax.numpy as jnp
import pytest

from composable_diffusion_models_tpu import data, eval as ceval


@pytest.fixture(scope="module")
def tiny_shapes():
    imgs, s, c = data.make_shapes_dataset(512, img_size=16)
    return imgs, s, c


@pytest.fixture(scope="module")
def trained_probe(tiny_shapes):
    imgs, s, c = tiny_shapes
    model, params = ceval.train_probe(
        jax.random.PRNGKey(0), imgs, (s, c), num_classes=(3, 3),
        steps=400, batch_size=64, base_dim=8, dtype=None)
    return model, params


class TestProbe:
    def test_probe_learns_both_factors(self, tiny_shapes, trained_probe):
        imgs, s, c = tiny_shapes
        model, params = trained_probe
        acc = ceval.probe_accuracy(model, params, imgs[:256],
                                   (s[:256], c[:256]))
        assert acc["factor_0_acc"] > 0.9, acc
        assert acc["factor_1_acc"] > 0.9, acc

    def test_output_shapes(self, tiny_shapes, trained_probe):
        imgs, _, _ = tiny_shapes
        model, params = trained_probe
        preds = ceval.classify(model, params, imgs[:8])
        assert len(preds) == 2
        assert all(p.shape == (8,) for p in preds)


class TestCompositionalScores:
    def test_oracle_samples_score_one(self, trained_probe):
        """Ground-truth renders of a (shape, color) combo must score ~1.0 —
        the metric's upper anchor."""
        model, params = trained_probe
        imgs, s, c = data.make_shapes_dataset(256, img_size=16)
        mask = (s == 1) & (c == 2)
        samples = imgs[mask][:16]
        scores = ceval.compositional_scores(model, params, samples, (1, 2))
        assert scores["joint_acc"] > 0.85, scores

    def test_wrong_target_scores_zero(self, trained_probe):
        model, params = trained_probe
        imgs, s, c = data.make_shapes_dataset(256, img_size=16)
        mask = (s == 1) & (c == 2)
        samples = imgs[mask][:16]
        scores = ceval.compositional_scores(model, params, samples, (0, 0))
        assert scores["joint_acc"] < 0.2, scores

    def test_noise_scores_low_joint(self, trained_probe):
        model, params = trained_probe
        noise = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 16, 3))
        scores = ceval.compositional_scores(model, params, noise, (1, 2))
        # an untrained-garbage input can't reliably hit a specific combo
        assert scores["joint_acc"] <= 0.5


class TestDistributionalMetrics:
    """FID-lite + within-class diversity (VERDICT r3 items 4 & 8)."""

    def test_frechet_zero_on_identical_sets(self, tiny_shapes, trained_probe):
        imgs, _, _ = tiny_shapes
        model, params = trained_probe
        f = ceval.probe_features(model, params, imgs[:128])
        assert f.shape == (128, 128)
        d = ceval.frechet_probe_distance(f, f)
        assert d < 1e-2, d

    def test_frechet_orders_noise_vs_real(self, tiny_shapes, trained_probe):
        """Real-vs-real split distance << real-vs-noise distance — the
        metric separates on-distribution from off-distribution samples."""
        imgs, _, _ = tiny_shapes
        model, params = trained_probe
        fa = ceval.probe_features(model, params, imgs[:200])
        fb = ceval.probe_features(model, params, imgs[200:400])
        noise = jax.random.normal(jax.random.PRNGKey(3), imgs[:200].shape)
        fn = ceval.probe_features(model, params, noise)
        d_real = ceval.frechet_probe_distance(fa, fb)
        d_noise = ceval.frechet_probe_distance(fa, fn)
        assert d_noise > 5 * d_real, (d_real, d_noise)

    def test_mode_collapse_fails_diversity(self, tiny_shapes, trained_probe):
        """The gate's mode-collapse check: a synthetic sampler emitting ONE
        image per class scores near-zero within-class diversity while the
        real data scores well above it — class-histogram entropy alone
        would pass both (VERDICT r3 weak-4)."""
        imgs, s, _ = tiny_shapes
        model, params = trained_probe
        real = ceval.within_class_diversity(model, params, imgs[:256])
        # one archetype per shape class, repeated — balanced class histogram
        idx = [int(jnp.argmax(s == c)) for c in range(3)]
        collapsed = jnp.concatenate(
            [jnp.repeat(imgs[i:i + 1], 32, axis=0) for i in idx])
        coll = ceval.within_class_diversity(model, params, collapsed)
        assert real["diversity_mean"] > 0.0
        assert coll["diversity_mean"] < 0.05 * real["diversity_mean"], (
            real, coll)
