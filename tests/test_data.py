"""Data-layer tests: rasterizer geometry, colorization, holdouts, batching."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_diffusion_models_tpu import data


class TestShapesRasterizer:
    def test_circle_area(self):
        mask = data.rasterize_shape(jnp.asarray(0), 64)
        # margin 16, shape spans [16, 48] inclusive -> r = 16
        area = float(mask.sum())
        assert abs(area - math.pi * 16**2) / (math.pi * 16**2) < 0.05

    def test_square_bounds(self):
        mask = np.asarray(data.rasterize_shape(jnp.asarray(1), 64))
        assert mask[16, 16] == 1 and mask[48, 48] == 1
        assert mask[15, 16] == 0 and mask[16, 15] == 0
        assert float(mask.sum()) == 33.0 * 33.0

    def test_triangle_geometry(self):
        mask = np.asarray(data.rasterize_shape(jnp.asarray(2), 64))
        assert mask[47, 32] == 1      # near base center, inside
        assert mask[17, 32] == 1      # apex
        assert mask[17, 16] == 0      # top-left corner, outside
        # base row fully filled between the corners
        assert mask[48, 16] == 1 and mask[48, 48] == 1

    def test_dataset_labels_cycle_and_range(self):
        imgs, sl, cl = data.make_shapes_dataset(18, 32)
        assert imgs.shape == (18, 32, 32, 3)
        assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0
        # all 9 combinations present EXACTLY twice (idx % 9 cycling — the
        # class balance the composition evals rely on)
        pairs = np.stack([np.asarray(sl), np.asarray(cl)], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        assert len(uniq) == 9
        assert (counts == 2).all(), counts

    def test_holdout_excluded(self):
        _, sl, cl = data.make_shapes_dataset(80, 32, holdout=[(0, 0), (2, 1)])
        combos = {(int(s), int(c)) for s, c in zip(sl, cl)}
        assert (0, 0) not in combos and (2, 1) not in combos
        assert len(combos) == 7

    def test_grayscale_and_white_bg(self):
        imgs, _, _ = data.make_shapes_dataset(9, 32, grayscale=True,
                                              background="white")
        assert imgs.shape == (9, 32, 32, 1)
        # white background -> corners are +1
        assert float(imgs[0, 0, 0, 0]) == 1.0

    def test_gray_luma_modes(self):
        """luma = ITU projection of the RGB set; luma_norm = luma / ||w||
        (the exact-diffusion-state protocol, experts.rgb_to_gray)."""
        rgb, sl, cl = data.make_shapes_dataset(9, 32)
        luma, sl2, _ = data.make_shapes_dataset(9, 32, grayscale="luma")
        norm, _, _ = data.make_shapes_dataset(9, 32, grayscale="luma_norm")
        assert luma.shape == (9, 32, 32, 1)
        np.testing.assert_array_equal(np.asarray(sl), np.asarray(sl2))
        w = np.array([0.299, 0.587, 0.114])
        expect = (np.asarray(rgb) * w).sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(luma), expect, atol=1e-5)
        np.testing.assert_allclose(np.asarray(norm),
                                   expect / np.sqrt((w * w).sum()), atol=1e-5)
        # a colored shape's luma is a DIM gray, far from the white-on-black
        # protocol's +1 foreground (in [-1,1]: pure red -> 2*0.299-1 = -0.402)
        assert -1.0 < float(np.asarray(luma).max()) < 0.2


class TestMNIST:
    def test_synthetic_class_filter(self, key):
        imgs, labels = data.synthetic_mnist(key, 64, classes=[3, 7])
        assert imgs.shape == (64, 28, 28, 1)
        assert set(np.asarray(labels).tolist()) <= {3, 7}
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
        # digits are visibly class-structured: different classes differ
        m3 = np.asarray(imgs[np.asarray(labels) == 3]).mean(0)
        m7 = np.asarray(imgs[np.asarray(labels) == 7]).mean(0)
        assert np.abs(m3 - m7).max() > 0.2

    def test_synthetic_deterministic(self, key):
        a, la = data.synthetic_mnist(key, 8)
        b, lb = data.synthetic_mnist(key, 8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_get_mnist_normalized(self, key):
        imgs, _ = data.get_mnist(key, 16, classes=[0, 1])
        assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0
        assert float(imgs.min()) < -0.5  # background is -1


class TestColoredMNIST:
    def test_per_digit_colors(self, key):
        imgs, labels, cl = data.colored_mnist(key, 32, classes=[6])
        assert imgs.shape[-1] == 3
        np.testing.assert_array_equal(np.asarray(labels), np.asarray(cl))
        arr = np.asarray(imgs)
        # digit 6 is red: green AND blue channels stay at background (-1)
        assert arr[..., 1].max() <= -0.99
        assert arr[..., 2].max() <= -0.99
        assert arr[..., 0].max() > 0.5

    def test_div4_rule(self, key):
        _, labels, cl = data.colored_mnist(key, 32, color_rule="div4")
        np.testing.assert_array_equal(np.asarray(cl),
                                      np.asarray(labels) // 4)

    def test_override_color(self, key):
        imgs, _, _ = data.colored_mnist(key, 8, color_override=(0.0, 1.0, 0.0))
        arr = np.asarray(imgs)
        assert arr[..., 0].max() <= -0.99 and arr[..., 1].max() > 0.5


class TestToy2D:
    def test_up_down_halves(self, key):
        up = data.toy2d(key, 512, up=True)
        down = data.toy2d(key, 512, up=False)
        assert float(up[:, 1].mean()) > 1.0     # y in {1.5}
        assert float(down[:, 1].mean()) < -1.0
        assert abs(float(up[:, 0].mean())) < 0.3  # x in {-1.5, 1.5}


class TestBatching:
    def test_epoch_batches_is_permutation(self, key):
        idx = data.epoch_batches(key, 100, 10)
        assert idx.shape == (10, 10)
        assert len(set(np.asarray(idx).ravel().tolist())) == 100

    def test_infinite_batches_cycles(self, key):
        gen = data.infinite_batches(key, 20, 8)
        seen = [next(gen) for _ in range(5)]  # crosses an epoch boundary
        assert all(b.shape == (8,) for b in seen)

    def test_infinite_batches_rejects_oversized_batch(self, key):
        # batch_size > n yields zero batches per epoch — the generator must
        # raise instead of spinning forever without yielding
        with pytest.raises(ValueError, match="batch_size"):
            next(data.infinite_batches(key, 10, 128))


def test_cifar10_returns_none_when_absent():
    assert data.load_cifar10("/nonexistent") is None


def test_cifar10_parses_binary_batches(tmp_path):
    rng = np.random.default_rng(0)
    rec = np.zeros((10, 3073), np.uint8)
    rec[:, 0] = np.arange(10) % 10
    rec[:, 1:] = rng.integers(0, 256, (10, 3072))
    (tmp_path / "data_batch_1.bin").write_bytes(rec.tobytes())
    out = data.load_cifar10(str(tmp_path), classes=[0, 1])
    assert out is not None
    imgs, labels = out
    assert imgs.shape == (2, 32, 32, 3)
    assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0


def test_synthetic_cifar10_roundtrips_binary_format(key, tmp_path):
    """Procedural CIFAR stand-in (VERDICT r2 #7): uint8 images round-trip
    bit-exactly through write_cifar10_binaries -> load_cifar10 (the same
    parse path a real download would use), classes are balanced, and the
    warm/cool palette split keeps the two expert halves visually distinct."""
    raw, lab = data.synthetic_cifar10(key, 40)
    assert raw.shape == (40, 32, 32, 3) and raw.dtype == jnp.uint8
    assert np.asarray(jnp.bincount(lab, length=10)).tolist() == [4] * 10
    d = data.write_cifar10_binaries(np.asarray(raw), np.asarray(lab),
                                    str(tmp_path / "bin"))
    out = data.load_cifar10(d)
    assert out is not None
    imgs, labels = out
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(lab))
    np.testing.assert_allclose(
        np.asarray(imgs),
        np.asarray(raw, np.float32) / 255.0 * 2.0 - 1.0, atol=1e-6)
    # split halves are linearly separable in mean hue: warm (R>B) vs cool
    m = np.asarray(raw, np.float32).mean(axis=(1, 2))  # (N, 3)
    warm = m[:, 0] - m[:, 2]
    lab_np = np.asarray(lab)
    assert warm[lab_np < 5].mean() > warm[lab_np >= 5].mean()


def test_mnist_idx_parses_synthetic_ubyte_files(tmp_path):
    # real-MNIST path (data.load_mnist): synthetic IDX fixtures, gzipped and
    # raw, mirroring the CIFAR binary-batch test above (VERDICT r2 item 8)
    import gzip as _gzip
    import struct as _struct
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (12, 28, 28), dtype=np.uint8)
    labels = (np.arange(12) % 10).astype(np.uint8)
    img_hdr = _struct.pack(">IIII", 0x00000803, 12, 28, 28)
    lab_hdr = _struct.pack(">II", 0x00000801, 12)
    with _gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(img_hdr + imgs.tobytes())
    (tmp_path / "train-labels-idx1-ubyte").write_bytes(
        lab_hdr + labels.tobytes())
    # both files must exist under the SAME extension to be picked up: the
    # mixed pair above is correctly skipped
    assert data.load_mnist(str(tmp_path)) is None
    with _gzip.open(tmp_path / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(lab_hdr + labels.tobytes())
    out = data.load_mnist(str(tmp_path))
    assert out is not None
    got_imgs, got_labels = out
    assert got_imgs.shape == (12, 28, 28, 1)
    np.testing.assert_allclose(np.asarray(got_imgs[..., 0]),
                               imgs.astype(np.float32) / 255.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got_labels), labels)
    # class filter
    got_imgs, got_labels = data.load_mnist(str(tmp_path), classes=[3, 7])
    assert set(np.asarray(got_labels).tolist()) == {3, 7}


def test_load_mnist_returns_none_when_absent():
    assert data.load_mnist("/nonexistent") is None


def test_get_dataset_registry(key):
    from composable_diffusion_models_tpu.data import get_dataset
    imgs, labels = get_dataset("mnist", key, n=32, classes=[1, 2])
    assert imgs.shape == (32, 28, 28, 1)
    imgs, d, c = get_dataset("colored_mnist", key, n=16)
    assert imgs.shape[-1] == 3 and d.shape == c.shape
    imgs, s, c = get_dataset("shapes", key, n=18, img_size=16)
    assert imgs.shape == (18, 16, 16, 3)
    pts, _ = get_dataset("toy2d", key, n=64)
    assert pts.shape == (64, 2)
    import pytest
    with pytest.raises(ValueError):
        get_dataset("nope", key)


def test_colored_mnist_holdout_pairs(key):
    from composable_diffusion_models_tpu.data import colored_mnist
    imgs, d, c = colored_mnist(key, 256, color_rule="random",
                               holdout=[(1, 0), (2, 2)])
    pairs = set(zip(np.asarray(d).tolist(), np.asarray(c).tolist()))
    assert (1, 0) not in pairs and (2, 2) not in pairs
    assert imgs.shape[0] == d.shape[0] == c.shape[0]
    assert len(pairs) > 0


def test_shapes_bbox_dataset():
    """3-factor dataset (VERDICT r1 missing-1): white bg, colored shape,
    colored bbox OUTLINE at padding 4 / width 2 on top
    (ref src/composing_conditional_diffusion_on_shape_and_color_4.py:89-116)."""
    from composable_diffusion_models_tpu import data

    imgs, s, c, b = data.make_shapes_bbox_dataset(27, img_size=64)
    assert imgs.shape == (27, 64, 64, 3)
    assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0
    # bbox color cycles idx % 3 independently of the shape/color combo
    np.testing.assert_array_equal(np.asarray(b), np.arange(27) % 3)
    arr = np.asarray(imgs)
    lut = np.asarray(data._SHAPE_COLOR_RGB) * 2.0 - 1.0
    # corner pixel (0,0) is outside the box: white background
    np.testing.assert_allclose(arr[:, 0, 0, :], 1.0)
    # pixel (4,10) lies on the top bbox stroke -> exactly the bbox color
    for i in range(6):
        np.testing.assert_allclose(arr[i, 4, 10, :], lut[i % 3], atol=1e-6)
    # pixel (5,10) is the second (inward) stroke row; (6,10) is interior white
    np.testing.assert_allclose(arr[0, 5, 10, :], lut[0], atol=1e-6)
    np.testing.assert_allclose(arr[0, 6, 10, :], 1.0, atol=1e-6)
    # center pixel carries the SHAPE color for every shape at this geometry
    for i in range(9):
        np.testing.assert_allclose(arr[i, 32, 32, :],
                                   lut[int(np.asarray(c)[i])], atol=1e-6)


def test_shapes_bbox_holdout():
    from composable_diffusion_models_tpu import data

    imgs, s, c, b = data.make_shapes_bbox_dataset(64, img_size=32,
                                                  holdout=[(2, 2)])
    pairs = set(zip(np.asarray(s).tolist(), np.asarray(c).tolist()))
    assert (2, 2) not in pairs and len(pairs) == 8


def test_shapes_bbox_registry(key):
    from composable_diffusion_models_tpu.data import get_dataset

    imgs, s, c, b = get_dataset("shapes_bbox", key, n=12, img_size=32)
    assert imgs.shape == (12, 32, 32, 3) and b.shape == (12,)
