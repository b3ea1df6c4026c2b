"""Deep exploration via bootstrapped ensembles (reference:
pearl/policy_learners/exploration_modules/sequential_decision_making/deep_exploration.py:26-93).

Each env instance holds a persistent epistemic index z (which ensemble member
it acts greedily against); z is resampled per env when its episode ends
(`reset` with the done mask), implementing Thompson-sampling-style temporally
consistent exploration (Osband et al., 2016).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.policy_learners.exploration_modules.common import (
    ExplorationModule,
    masked_argmax,
)


@struct.dataclass
class DeepExplorationState:
    z: jnp.ndarray  # (B,) i32 ensemble index per env


@dataclasses.dataclass(frozen=True)
class DeepExploration(ExplorationModule):
    ensemble_size: int = 10

    def init(self, num_envs: int):
        return DeepExplorationState(z=jnp.zeros((num_envs,), jnp.int32))

    def act(self, state, scores, exploit_index, mask, key):
        """`scores` here is the per-member Q tensor (B, K, A); act greedily
        w.r.t. the member indexed by this env's persistent z."""
        member_q = jnp.take_along_axis(scores, state.z[:, None, None], axis=1)[:, 0, :]
        return state, masked_argmax(member_q, mask)

    def reset(self, state, done_mask, key):
        fresh = jax.random.randint(
            key, state.z.shape, 0, self.ensemble_size, dtype=jnp.int32
        )
        return DeepExplorationState(z=jnp.where(done_mask, fresh, state.z))
