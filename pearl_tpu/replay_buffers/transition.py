"""Transition pytrees (reference: pearl/replay_buffers/transition.py:22-240).

The reference's `Transition`/`TransitionBatch` are mutable dataclasses of
optional tensors assembled per-sample with `torch.cat`. Here a single
`TransitionBatch` flax.struct dataclass serves as BOTH the per-step record
(leading axis = num_envs) and the sampled batch (leading axis = batch_size) —
the ring buffer stores one of these with leading axis = capacity.

Availability is carried as boolean masks (True = available) over the fixed
trace-time action set, the complement of the reference's
`unavailable_actions_mask`. Per-step action *features* (dynamic-action
recommender case) are optional tensors.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TransitionBatch:
    state: jnp.ndarray  # (B, s) or pytree leaf of obs
    action: jnp.ndarray  # (B, a) raw action vector as stored by the env/agent
    reward: jnp.ndarray  # (B,)
    next_state: jnp.ndarray  # (B, s)
    terminated: jnp.ndarray  # (B,) bool — default True in reference (bandit-friendly)
    truncated: jnp.ndarray  # (B,) bool
    action_index: Optional[jnp.ndarray] = None  # (B,) i32 — discrete only
    curr_available_mask: Optional[jnp.ndarray] = None  # (B, A) bool
    next_available_mask: Optional[jnp.ndarray] = None  # (B, A) bool
    curr_available_actions: Optional[jnp.ndarray] = None  # (B, A, a) dynamic features
    next_available_actions: Optional[jnp.ndarray] = None  # (B, A, a)
    next_action: Optional[jnp.ndarray] = None  # (B, a) — SARSA
    next_action_index: Optional[jnp.ndarray] = None  # (B,) — SARSA
    weight: Optional[jnp.ndarray] = None  # (B,)
    cost: Optional[jnp.ndarray] = None  # (B,)
    # Steps between state and next_state (reference transition.py:46 — used
    # for multi-step bootstrapping; defaults to 1 when absent).
    time_diff: Optional[jnp.ndarray] = None  # (B,)
    bootstrap_mask: Optional[jnp.ndarray] = None  # (B, K) — BootstrapReplayBuffer

    @property
    def batch_size(self) -> int:
        return self.reward.shape[0]

    @property
    def done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)


def single_transition(**kwargs) -> TransitionBatch:
    """Build a TransitionBatch with batch axis of size 1 from unbatched leaves."""
    import jax

    batch = TransitionBatch(**kwargs)
    return jax.tree.map(lambda x: jnp.asarray(x)[None, ...], batch)
