"""The reference's UCI contextual-bandit benchmark protocol, end to end
(reference: pearl/utils/scripts/cb_benchmark/run_cb_benchmarks.py:46-332).

Runs SquareCB / FastCB over NeuralBandit and UCB / Thompson over
NeuralLinearBandit (binary action embeddings, gamma = 10*sqrt(T*d)) for T
online interactions on letter / pendigits / satimage / yeast, then the
offline uniform-logging-policy protocol. With no --data-dir it uses the
bundled deterministic UCI-shaped dataset twins
(pearl_tpu/benchmarks/cb_datasets.py); point --data-dir at a directory with
the real UCI files (letter-recognition.data, pendigits.tra, sat.trn,
yeast.data) to run on real data.

Usage: python examples/cb_benchmark.py [--data-dir DIR] [--t 5000]
"""

import argparse

from pearl_tpu.benchmarks.cb import (
    CB_DATASETS,
    run_cb_benchmark_suite,
    run_offline_cb_experiment,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--t", type=int, default=5000)
    p.add_argument("--skip-offline", action="store_true")
    args = p.parse_args()

    run_cb_benchmark_suite(T=args.t, data_dir=args.data_dir, verbose=True)
    if not args.skip_offline:
        for ds in CB_DATASETS:
            out = run_offline_cb_experiment(ds, data_dir=args.data_dir)
            print(
                f"offline {ds:10s} source={out['source']} "
                f"avg_regret={out['final_avg_regret']:.3f}"
            )


if __name__ == "__main__":
    main()
