"""Functional environment API (reference: pearl/api/environment.py:21-61).

The reference's `Environment` is a stateful object with `reset()`/`step()`.
TPU-native environments are pure: env *configs* are static objects exposing

    reset(key)                -> (EnvState, Observation)
    step(state, action, key)  -> (EnvState, ActionResult)

with `EnvState` a flax.struct pytree. This is what makes `vmap` over thousands
of env instances and `lax.scan` over time possible. Discrete envs receive the
raw stored action vector (for gym-style `Discrete` spaces this is a length-1
vector holding the action index, matching what the reference's
`DiscreteActionSpace` stores).
"""

from __future__ import annotations

import abc
from typing import Any, Tuple

from pearl_tpu.api.types import ActionResult, Observation, PRNGKey

EnvState = Any  # pytree


class Environment(abc.ABC):
    """Abstract pure environment."""

    @property
    @abc.abstractmethod
    def action_space(self):
        ...

    @property
    @abc.abstractmethod
    def observation_space(self):
        ...

    @property
    def observation_dim(self) -> int:
        shape = self.observation_space.shape
        if len(shape) == 1:
            return int(shape[0])
        # Discrete observation spaces report their element dim.
        return int(shape[-1])

    @abc.abstractmethod
    def reset(self, key: PRNGKey) -> Tuple[EnvState, Observation]:
        ...

    @abc.abstractmethod
    def step(self, state: EnvState, action, key: PRNGKey) -> Tuple[EnvState, ActionResult]:
        ...

    @property
    def max_episode_steps(self) -> int:
        """Truncation horizon (0 = none). Used by drivers for episode stats."""
        return 0
