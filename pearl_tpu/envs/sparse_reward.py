"""Sparse-reward 2-D point-reach environments (reference:
pearl/utils/instantiations/environments/sparse_reward_environment.py:41-198).

Observation = [position(2) ; goal(2)]. Reward is -1 every step until the
agent is within `reward_distance` of the goal (then 0, terminated) — the
pathological sparse setting HER is designed for."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxActionSpace, BoxSpace, DiscreteActionSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


@struct.dataclass
class SparseRewardState:
    position: jnp.ndarray  # (2,)
    goal: jnp.ndarray  # (2,)
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class DiscreteSparseRewardEnvironment(Environment):
    """N compass directions, fixed step size (reference :41-130)."""

    length: float = 100.0
    num_actions: int = 4
    step_size: float = 4.0
    reward_distance: float = 4.0
    max_steps: int = 50

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(self.num_actions)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(jnp.zeros(4), self.length * jnp.ones(4))

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, state: SparseRewardState) -> jnp.ndarray:
        return jnp.concatenate([state.position, state.goal])

    def reset(self, key: PRNGKey) -> Tuple[SparseRewardState, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        position = jax.random.uniform(k1, (2,), minval=0.0, maxval=self.length)
        goal = jax.random.uniform(k2, (2,), minval=0.0, maxval=self.length)
        state = SparseRewardState(
            position=position, goal=goal, t=jnp.zeros((), jnp.int32)
        )
        return state, self._obs(state)

    def step(self, state, action, key) -> Tuple[SparseRewardState, ActionResult]:
        idx = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        angle = 2.0 * jnp.pi * idx / self.num_actions
        delta = self.step_size * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        position = jnp.clip(state.position + delta, 0.0, self.length)
        reached = jnp.linalg.norm(position - state.goal) < self.reward_distance
        t = state.t + 1
        new_state = SparseRewardState(position=position, goal=state.goal, t=t)
        result = ActionResult(
            observation=self._obs(new_state),
            reward=jnp.where(reached, 0.0, -1.0),
            terminated=reached,
            truncated=jnp.logical_and(t >= self.max_steps, jnp.logical_not(reached)),
        )
        return new_state, result


@dataclasses.dataclass(frozen=True, eq=False)
class ContinuousSparseRewardEnvironment(DiscreteSparseRewardEnvironment):
    """Continuous displacement actions (reference :131-198)."""

    @property
    def action_space(self) -> BoxActionSpace:
        return BoxActionSpace.create(
            -self.step_size * jnp.ones(2), self.step_size * jnp.ones(2)
        )

    def step(self, state, action, key):
        delta = jnp.clip(
            jnp.reshape(action, (2,)), -self.step_size, self.step_size
        )
        position = jnp.clip(state.position + delta, 0.0, self.length)
        reached = jnp.linalg.norm(position - state.goal) < self.reward_distance
        t = state.t + 1
        new_state = SparseRewardState(position=position, goal=state.goal, t=t)
        result = ActionResult(
            observation=self._obs(new_state),
            reward=jnp.where(reached, 0.0, -1.0),
            terminated=reached,
            truncated=jnp.logical_and(t >= self.max_steps, jnp.logical_not(reached)),
        )
        return new_state, result
