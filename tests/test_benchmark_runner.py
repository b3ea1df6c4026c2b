"""Benchmark harness shape test (reference benchmark.py:364-477 usage):
run_benchmark produces (runs, bins) curves per method, persists .npy, and
renders the mean±stderr figure. The committed round-4 experiment grid
(docs/experiment_grid/) was produced by this exact pipeline
(docs/parity_evidence/experiment_grid.py).
"""

import os

import numpy as np

from pearl_tpu.benchmarks.run import run_benchmark
from pearl_tpu.envs import CartPole


def test_run_benchmark_shapes_npy_and_plot(tmp_path):
    out = str(tmp_path / "grid")
    results = run_benchmark(
        ["DQN", "SAC"],
        CartPole,
        num_envs=4,
        max_steps=2_000,
        record_period=500,
        num_runs=2,
        out_dir=out,
        plot=True,
    )
    assert set(results) == {"DQN", "SAC"}
    for name, curves in results.items():
        assert curves.shape == (2, 4), (name, curves.shape)  # (runs, bins)
        assert np.isfinite(curves[~np.isnan(curves)]).all()
        assert os.path.exists(os.path.join(out, f"{name}.npy"))
        saved = np.load(os.path.join(out, f"{name}.npy"))
        np.testing.assert_array_equal(saved, curves)
    assert os.path.exists(os.path.join(out, "benchmark.png"))
    assert os.path.getsize(os.path.join(out, "benchmark.png")) > 1_000
