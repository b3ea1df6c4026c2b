"""Round-4 experiment grid (VERDICT r3 item 9): a reference-style experiment
set — 4 methods x 2 envs x 4 seeds — through `benchmarks.run.run_benchmark`,
exactly the way the reference's benchmark.py:364-477 is meant to be used
(method registry in, mean +/- stderr learning-curve figure + raw .npy out).

Run: python docs/parity_evidence/experiment_grid.py
Outputs: docs/experiment_grid/{cartpole,acrobot}/{METHOD}.npy + benchmark.png
         docs/experiment_grid/summary.json
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pearl_tpu.benchmarks.run import run_benchmark
from pearl_tpu.envs import Acrobot, CartPole

METHODS = ["DQN", "DoubleDQN", "SAC", "PPO"]
GRID = {"cartpole": CartPole, "acrobot": Acrobot}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiment_grid")

summary = {}
for env_name, env_factory in GRID.items():
    t0 = time.time()
    out_dir = os.path.join(OUT, env_name)
    results = run_benchmark(
        METHODS, env_factory, num_envs=16, max_steps=80_000,
        record_period=4_000, num_runs=4, out_dir=out_dir, plot=True,
    )
    summary[env_name] = {
        name: {
            "final_mean": float(np.nanmean(curves[:, -3:])),
            "final_stderr": float(
                np.nanstd(np.nanmean(curves[:, -3:], axis=1))
                / np.sqrt(curves.shape[0])
            ),
            "first_bin_mean": float(np.nanmean(curves[:, 0])),
        }
        for name, curves in results.items()
    }
    summary[env_name]["wall_s"] = round(time.time() - t0, 1)
    print(env_name, json.dumps(summary[env_name]), flush=True)

with open(os.path.join(OUT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print("grid done")
