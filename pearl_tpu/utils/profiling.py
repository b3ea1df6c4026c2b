"""Profiling & tracing — first-class here vs the reference's none
(SURVEY.md §5: Pearl has only TorchScript/fx *compatibility* hooks).

`trace(dir)` wraps a code block in a jax.profiler trace viewable in
TensorBoard/Perfetto; `timed` measures steady-state wall time of a jitted
callable with correct device synchronization."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/device trace: `with trace("/tmp/trace"): run_fn(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10) -> float:
    """Steady-state seconds/call of `fn(*args)` (blocks on outputs)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
