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
    num_envs: int = 1  # per-env pending cache size

    def extra_example_fields(self, action_space):
        action_dim = action_space.action_dim
        return {
            "next_action": jnp.zeros((1, action_dim)),
            "next_action_index": jnp.zeros((1,), jnp.int32),
        }

    def init(self, example: TransitionBatch) -> SARSABufferState:
        base = super().init(example)
        pending = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:1], (self.num_envs,) + x.shape[1:]).copy(),
            example,
        )
        return SARSABufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            pending=pending,
            pending_valid=jnp.zeros((), jnp.bool_),
        )

    @property
    def supports_deferred_push(self) -> bool:
        return False  # per-env pending cache pairs rows stepwise

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

        # On the very first push there is no valid pending batch yet (the
        # reference cache is empty): gate the commit on pending_valid.
        storage, cursor, size = jax.lax.cond(
            state.pending_valid, commit, skip, state
        )
        # Keep pending's pytree structure identical to the example (incoming
        # agent batches carry next_action=None; fill with placeholders).
        pending = batch.replace(
            next_action=jnp.zeros_like(batch.action),
            next_action_index=jnp.zeros_like(batch.action_index),
        )
        return SARSABufferState(
            storage=storage,
            cursor=cursor,
            size=size,
            pending=pending,
            pending_valid=jnp.ones((), jnp.bool_),
        )
