"""Structured metrics logging (reference: ad-hoc stdout prints + per-round
metric lists, SURVEY.md §5 "Metrics / logging / observability").

`MetricsLogger` appends JSONL records (step, name, value) and computes the
normalized scores used by offline-RL evaluation (reference
benchmark_offline_rl.py:37-357)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(np.asarray(v)) for k, v in metrics.items()})
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()


def normalized_score(
    score: float, random_score: float, expert_score: float
) -> float:
    """D4RL-style normalized score: 0 = random policy, 100 = expert
    (reference benchmark_offline_rl.py normalized evaluation)."""
    denom = expert_score - random_score
    if abs(denom) < 1e-12:
        return 0.0
    return 100.0 * (score - random_score) / denom
