"""On-policy trajectory buffer (reference: the generated PPO/REINFORCE
buffers, pearl/utils/replay_buffer_utils.py:38-129 + ppo.py:48-83,
reinforce.py:53-80).

The reference extends Transition with per-algorithm fields (GAE, lambda
returns, frozen action probs) mutated in a backward Python walk over the
buffer (ppo.py:202-294). Here the buffer is a fixed-size rollout: the driver
learns exactly when `capacity = rollout_steps * num_envs` transitions have
been pushed; `trajectory_view` exposes storage as (T, num_envs, ...) so the
whole-buffer backward pass becomes a reverse `lax.scan` inside the learner,
and derived quantities never need to be stored at all.
"""

from __future__ import annotations

import dataclasses

import jax

from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@dataclasses.dataclass(frozen=True)
class OnPolicyReplayBuffer(BasicReplayBuffer):
    num_envs: int = 1

    @property
    def rollout_steps(self) -> int:
        return self.capacity // self.num_envs

    def trajectory_view(self, state: ReplayBufferState) -> TransitionBatch:
        """Storage reshaped to (T, num_envs, ...), time-ordered: pushes happen
        num_envs-at-a-time starting from cursor 0 after each clear."""
        T, B = self.rollout_steps, self.num_envs
        return jax.tree.map(
            lambda x: x[: T * B].reshape((T, B) + x.shape[1:]), state.storage
        )
