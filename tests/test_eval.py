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
