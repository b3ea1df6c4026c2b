"""Core typed primitives (reference: pearl/api/).

The reference defines `Action = Tensor`, `ActionResult` (pearl/api/action_result.py:18-30),
and loose aliases for Observation/Reward/SubjectiveState. Here everything is a JAX array
or a pytree; `ActionResult` is a `flax.struct` dataclass so an entire env step result can
flow through `jit`/`vmap`/`scan` unmodified.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct

# Type aliases (documentation-level, like the reference's pearl/api/*.py aliases).
Action = jnp.ndarray  # shape (action_dim,) — or (B, action_dim) when batched
Observation = Any  # pytree of arrays
Reward = jnp.ndarray  # scalar f32 — or (B,) when batched
SubjectiveState = jnp.ndarray
PRNGKey = jnp.ndarray


@struct.dataclass
class ActionResult:
    """Result of one environment step (reference: pearl/api/action_result.py:18-30).

    `available_actions_mask` replaces the reference's per-step mutable
    `available_action_space`: under jit the number of actions is fixed at trace
    time and availability is a boolean mask (True = available), matching the
    padded+masked representation the reference's replay buffer already uses
    (pearl/replay_buffers/tensor_based_replay_buffer.py:180-252).
    """

    observation: Observation
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    cost: Optional[jnp.ndarray] = None
    available_actions_mask: Optional[jnp.ndarray] = None  # (A,) bool
    info: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)
