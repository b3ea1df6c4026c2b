"""CB benchmark suite: bundled UCI-shaped datasets + the reference's
online/offline regret protocols (run_cb_benchmarks.py:46-332) actually
execute and learn."""

import numpy as np

from pearl_tpu.benchmarks.cb import (
    cb_benchmark_method,
    run_cb_benchmark_suite,
    run_offline_cb_experiment,
)
from pearl_tpu.benchmarks.cb_datasets import (
    DATASET_SPECS,
    get_dataset,
    load_uci_dataset,
    synthetic_uci_dataset,
)


def test_synthetic_datasets_shapes_and_determinism():
    for name, (n, d, k) in DATASET_SPECS.items():
        X, y = synthetic_uci_dataset(name)
        assert X.shape == (n, d) and y.shape == (n,)
        assert y.min() >= 0 and y.max() == k - 1
        X2, y2 = synthetic_uci_dataset(name)
        np.testing.assert_array_equal(X, X2)
        np.testing.assert_array_equal(y, y2)
        # Standardized features.
        np.testing.assert_allclose(X.mean(0), 0.0, atol=1e-4)


def test_real_uci_parser_roundtrip(tmp_path):
    """Write a tiny letter-format file and parse it with the reference's
    column conventions (cb_benchmark_config.py:57-61: first column is the
    alphabetic label)."""
    f = tmp_path / "letter-recognition.data"
    f.write_text("A,1,2,3\nB,4,5,6\nA,7,8,9\n")
    X, y = load_uci_dataset("letter", str(tmp_path))
    assert X.shape == (3, 3)
    np.testing.assert_array_equal(y, [0, 1, 0])
    X2, y2, source = get_dataset("letter", str(tmp_path))
    assert source == "uci" and X2.shape == (3, 3)
    _, _, source = get_dataset("letter", None)
    assert source == "synthetic"


def test_online_suite_learns_one_cell():
    res = run_cb_benchmark_suite(
        datasets=("yeast",), methods=("NeuralSquareCB",), T=1500, num_envs=10
    )
    cell = res["yeast"]["NeuralSquareCB"]
    # Random policy regret on 10 classes ~= 0.9; learned must be far below.
    assert cell["final_avg_regret"] < 0.5
    assert res["yeast"]["_source"] == "synthetic"
    # Regret curve is cumulative (nondecreasing).
    cum = cell["cumulative_regret"]
    assert np.all(np.diff(cum) >= -1e-6)


def test_offline_protocol_learns():
    out = run_offline_cb_experiment(
        "satimage", T=4000, train_batches=400, num_eval_steps=100
    )
    assert out["final_avg_regret"] < 0.4  # random ~ 0.83 on 6 classes


def test_all_four_methods_construct():
    for m in ("NeuralSquareCB", "NeuralFastCB", "NeuralLinUCB", "NeuralLinTS"):
        agent = cb_benchmark_method(m, feature_dim=8, num_classes=10, T=1000)
        assert agent.policy_learner is not None
