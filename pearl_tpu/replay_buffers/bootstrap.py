"""Bootstrap replay buffer (reference:
pearl/replay_buffers/sequential_decision_making/bootstrap_replay_buffer.py:24-115).

Each pushed transition draws a Bernoulli(p)^K inclusion mask over the K
ensemble members at push time; BootstrappedDQN's per-member loss is weighted
by this mask (Osband et al. 2016)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@dataclasses.dataclass(frozen=True)
class BootstrapReplayBuffer(BasicReplayBuffer):
    p: float = 0.5
    ensemble_size: int = 10

    def extra_example_fields(self, action_space):
        return {"bootstrap_mask": jnp.zeros((1, self.ensemble_size))}

    def push(
        self,
        state: ReplayBufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> ReplayBufferState:
        n = batch.reward.shape[0]
        mask = jax.random.bernoulli(key, self.p, (n, self.ensemble_size)).astype(
            jnp.float32
        )
        batch = batch.replace(bootstrap_mask=mask)
        return super().push(state, batch)
