"""Smoke-execute every bench.py measurement program at tiny sizes (CPU).

bench.py is the driver-facing artifact — it runs ONCE per round on the real
TPU and its JSON line is the round's recorded benchmark. A runtime error in
any of its measurement paths (the headline sampler, the train-throughput,
shapes-64, or DiT secondary metrics) would void that record, and the paths
are plain scripts no other test imports. These tests execute each jitted
program end-to-end at miniature shapes so breakage is caught by the CPU
test suite before the driver hits it.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_mnist_sampler_program_runs():
    ips, per_batch = bench.run(batch_size=2, base_dim=8, iters=1, n_steps=2)
    assert ips > 0 and per_batch > 0


def test_train_throughput_program_runs():
    assert bench.measure_train_throughput(base_dim=8, batch_size=8,
                                          steps=2) > 0


def test_shapes_program_runs():
    assert bench.measure_shapes_throughput(iters=1, bs=2, base_dim=8,
                                           img_size=16, n_steps=2) > 0


def test_dit_program_runs():
    assert bench.measure_dit_throughput(batch_size=2, iters=1, dim=32,
                                        depth=1, n_steps=2) > 0


def test_flop_helpers_consistent():
    # headline definition is exact at the default shape; scaled shapes follow
    # the documented quadratic width/area law
    assert abs(bench.gflop_per_image(64, 28, 0)
               - bench.MNIST_GFLOP_PER_IMAGE) < 1e-9
    assert abs(bench.gflop_per_image(128, 28, 0)
               - 4 * bench.MNIST_GFLOP_PER_IMAGE) < 1e-6
    # pad_to defines the compute canvas
    assert bench.gflop_per_image(64, 28, 32) > bench.gflop_per_image(64, 28, 0)
    assert bench.dit_gflop_per_image() > 0
