"""Prioritized experience replay (Schaul et al. 2016).

NOT in the reference (SURVEY.md §2.7 notes its absence) but named as a target
capability in BASELINE.json; included as an extension.

TPU-native design: instead of a host-side sum tree (pointer-chasing,
jit-hostile), priorities live in a dense (capacity,) array and sampling draws
from softmax(alpha * log p) via `jax.random.categorical` — an O(capacity)
vectorized op that XLA fuses well and that is exact (not an approximation).
Importance weights w = (N * P(i))^-beta / max w are returned in the batch's
`weight` field; learners that honor `weight` (all TD learners via masked
means) get bias correction for free. New transitions enter with the current
max priority; `update_priorities` is called by the learner with |TD error|.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class PrioritizedBufferState(ReplayBufferState):
    priorities: jnp.ndarray = None  # (capacity,)


@dataclasses.dataclass(frozen=True)
class PrioritizedReplayBuffer(BasicReplayBuffer):
    alpha: float = 0.6
    beta: float = 0.4
    epsilon: float = 1e-4

    def init(self, example: TransitionBatch) -> PrioritizedBufferState:
        base = super().init(example)
        return PrioritizedBufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            priorities=jnp.zeros((self.capacity,)),
        )

    def push(
        self,
        state: PrioritizedBufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> PrioritizedBufferState:
        n = batch.reward.shape[0]
        # Same bump-ring start rule as the base storage write.
        start = jnp.where(state.cursor + n <= self.capacity, state.cursor, 0)
        base = super().push(
            ReplayBufferState(storage=state.storage, cursor=state.cursor, size=state.size),
            batch,
        )
        max_p = jnp.maximum(jnp.max(state.priorities), 1.0)
        priorities = jax.lax.dynamic_update_slice_in_dim(
            state.priorities, jnp.full((n,), max_p), start, axis=0
        )
        return PrioritizedBufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            priorities=priorities,
        )

    def sample(
        self, state: PrioritizedBufferState, key: PRNGKey, batch_size: int
    ) -> TransitionBatch:
        valid = jnp.arange(self.capacity) < state.size
        logits = self.alpha * jnp.log(jnp.maximum(state.priorities, self.epsilon))
        logits = jnp.where(valid, logits, -jnp.inf)
        idx = jax.random.categorical(key, logits, shape=(batch_size,))
        batch = jax.tree.map(lambda buf: buf[idx], state.storage)
        # Importance-sampling weights, normalized by the max over the batch.
        probs = jax.nn.softmax(logits)
        n = jnp.maximum(state.size, 1).astype(jnp.float32)
        w = (n * jnp.maximum(probs[idx], 1e-12)) ** (-self.beta)
        w = w / jnp.maximum(jnp.max(w), 1e-12)
        return batch.replace(weight=w)

    def sample_with_indices(self, state, key, batch_size):
        """Like sample, but also returns the drawn indices so the learner can
        write back updated priorities."""
        valid = jnp.arange(self.capacity) < state.size
        logits = self.alpha * jnp.log(jnp.maximum(state.priorities, self.epsilon))
        logits = jnp.where(valid, logits, -jnp.inf)
        idx = jax.random.categorical(key, logits, shape=(batch_size,))
        batch = jax.tree.map(lambda buf: buf[idx], state.storage)
        probs = jax.nn.softmax(logits)
        n = jnp.maximum(state.size, 1).astype(jnp.float32)
        w = (n * jnp.maximum(probs[idx], 1e-12)) ** (-self.beta)
        w = w / jnp.maximum(jnp.max(w), 1e-12)
        return batch.replace(weight=w), idx

    def update_priorities(
        self, state: PrioritizedBufferState, indices: jnp.ndarray, td_errors: jnp.ndarray
    ) -> PrioritizedBufferState:
        new_p = jnp.abs(td_errors) + self.epsilon
        return state.replace(priorities=state.priorities.at[indices].set(new_p))
