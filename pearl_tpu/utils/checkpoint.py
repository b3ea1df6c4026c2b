"""Checkpointing (reference: the PyTorch state_dict protocol on every Pearl
component, pearl/api/agent.py:19 + get/set_extra_state hooks — SURVEY.md §5).

Because the ENTIRE agent (params, optimizer states, replay buffer, RNG,
exploration counters) is one pytree here, checkpoint/resume is a single Orbax
save/restore of that pytree — strictly stronger than the reference, which
never checkpoints optimizers' replay buffers automatically."""

from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, state: Any) -> None:
    """Save any pytree (e.g. an AgentState) to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def restore(path: str, example: Any) -> Any:
    """Restore a pytree saved with `save`. `example` provides the structure
    (e.g. a freshly initialized AgentState)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, example)
