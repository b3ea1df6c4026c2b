"""SARSA replay buffer (reference:
pearl/replay_buffers/sequential_decision_making/sarsa_replay_buffer.py:19-102).

A transition is only committed once the NEXT action is known: incoming
transitions are held in a per-env pending cache; the next push fills
`next_action` from the new batch's action and commits the pending rows. The
reference implements the same 1-step delay with a Python cache; here it is a
pytree field so the whole thing stays inside the compiled step."""

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
class SARSABufferState(ReplayBufferState):
    pending: TransitionBatch = None
    pending_valid: jnp.ndarray = None  # scalar bool


@dataclasses.dataclass(frozen=True)
class SARSAReplayBuffer(BasicReplayBuffer):
    def extra_example_fields(self, action_space):
        action_dim = action_space.action_dim
        return {
            "next_action": jnp.zeros((1, action_dim)),
            "next_action_index": jnp.zeros((1,), jnp.int32),
        }

    def init(self, example: TransitionBatch) -> SARSABufferState:
        base = super().init(example)
        return SARSABufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            pending=example,  # shape (num_envs, ...) once first push arrives
            pending_valid=jnp.zeros((), jnp.bool_),
        )

    def push(
        self,
        state: SARSABufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> SARSABufferState:
        del key
        committed = state.pending.replace(
            next_action=batch.action, next_action_index=batch.action_index
        )

        def commit(s):
            base = super(SARSAReplayBuffer, self).push(
                ReplayBufferState(storage=s.storage, cursor=s.cursor, size=s.size),
                committed,
            )
            return (base.storage, base.cursor, base.size)

        def skip(s):
            return (s.storage, s.cursor, s.size)

        # On the very first push there is no pending batch yet (the reference
        # cache is empty); afterwards the pending shape matches `batch`.
        pending_matches = state.pending.reward.shape == batch.reward.shape
        if not pending_matches:
            storage, cursor, size = state.storage, state.cursor, state.size
        else:
            storage, cursor, size = jax.lax.cond(
                state.pending_valid, commit, skip, state
            )
        return SARSABufferState(
            storage=storage,
            cursor=cursor,
            size=size,
            pending=batch,
            pending_valid=jnp.ones((), jnp.bool_),
        )
