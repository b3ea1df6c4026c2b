"""Miscellaneous reference-parity environments:

- `MeanVarBanditEnvironment` (reference pearl/user_envs/envs/bandit.py:21-70):
  two arms; arm 0 is safe (low variance), arm 1 has higher mean but high
  variance — the testbed for risk-sensitive (mean-variance) safety modules.
- `FixedNumberOfStepsEnvironment` (reference
  pearl/utils/instantiations/environments/environments.py:31-78): a trivial
  env that runs a fixed number of steps; useful for driver tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxSpace, DiscreteActionSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


@struct.dataclass
class _ScalarState:
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MeanVarBanditEnvironment(Environment):
    safe_mean: float = 1.0
    risky_mean: float = 2.0
    risky_sigma: float = 4.0

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(2)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(jnp.zeros(1), jnp.ones(1))

    def reset(self, key: PRNGKey):
        return _ScalarState(t=jnp.zeros((), jnp.int32)), jnp.zeros((1,))

    def step(self, state, action, key):
        idx = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        noise = jax.random.normal(key)
        reward = jnp.where(
            idx == 0,
            self.safe_mean,
            self.risky_mean + self.risky_sigma * noise,
        )
        result = ActionResult(
            observation=jnp.zeros((1,)),
            reward=reward,
            terminated=jnp.ones((), bool),
            truncated=jnp.zeros((), bool),
        )
        return state, result


@dataclasses.dataclass(frozen=True)
class FixedNumberOfStepsEnvironment(Environment):
    number_of_steps: int = 100

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(2)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(jnp.zeros(1), jnp.full((1,), float(self.number_of_steps)))

    @property
    def max_episode_steps(self) -> int:
        return self.number_of_steps

    def reset(self, key: PRNGKey):
        return _ScalarState(t=jnp.zeros((), jnp.int32)), jnp.zeros((1,))

    def step(self, state, action, key):
        t = state.t + 1
        idx = jnp.reshape(action, (-1,))[0]
        result = ActionResult(
            observation=t.astype(jnp.float32)[None],
            reward=idx.astype(jnp.float32),  # reward equals the chosen action
            terminated=jnp.zeros((), bool),
            truncated=t >= self.number_of_steps,
        )
        return _ScalarState(t=t), result
