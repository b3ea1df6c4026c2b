from pearl_tpu.benchmarks.configs import METHODS, Method, make_agent
from pearl_tpu.benchmarks.offline_rl import (
    OfflineRLResult,
    mix_datasets,
    run_offline_rl_benchmark,
)
from pearl_tpu.benchmarks.run import run_benchmark

__all__ = [
    "Method",
    "METHODS",
    "make_agent",
    "run_benchmark",
    "run_offline_rl_benchmark",
    "OfflineRLResult",
    "mix_datasets",
]
