from pearl_tpu.benchmarks.configs import METHODS, Method, make_agent
from pearl_tpu.benchmarks.run import run_benchmark

__all__ = ["Method", "METHODS", "make_agent", "run_benchmark"]
