"""FrozenLake-v1 (4x4, optionally slippery) as a pure JAX environment.

Used by the reference's FrozenLake integration test
(test/integration/test_integration.py:176-210), which wraps the discrete
observation in one-hot form via `OneHotObservationsFromDiscrete`
(pearl/utils/instantiations/environments/environments.py). Here the one-hot
conversion is a config flag.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxSpace, DiscreteActionSpace, DiscreteSpace
from pearl_tpu.api.types import ActionResult, PRNGKey

# 4x4 map: S=start, F=frozen, H=hole, G=goal.
_MAP_4X4 = "SFFFFHFHFFFHHFFG"
# Actions: 0=left, 1=down, 2=right, 3=up.
_DELTAS = jnp.array([[0, -1], [1, 0], [0, 1], [-1, 0]], dtype=jnp.int32)


@struct.dataclass
class FrozenLakeState:
    pos: jnp.ndarray  # i32 cell index
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FrozenLake(Environment):
    size: int = 4
    slippery: bool = True
    one_hot_obs: bool = True
    max_steps: int = 100

    @property
    def n_cells(self) -> int:
        return self.size * self.size

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(4)

    @property
    def observation_space(self):
        if self.one_hot_obs:
            return BoxSpace.create(
                jnp.zeros(self.n_cells), jnp.ones(self.n_cells)
            )
        return DiscreteSpace.range(self.n_cells)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _cell_flags(self):
        holes = jnp.array([c == "H" for c in _MAP_4X4], dtype=jnp.bool_)
        goals = jnp.array([c == "G" for c in _MAP_4X4], dtype=jnp.bool_)
        return holes, goals

    def _obs(self, pos):
        if self.one_hot_obs:
            return jax.nn.one_hot(pos, self.n_cells)
        return jnp.asarray(pos, jnp.float32)[None]

    def reset(self, key: PRNGKey) -> Tuple[FrozenLakeState, jnp.ndarray]:
        del key
        state = FrozenLakeState(pos=jnp.zeros((), jnp.int32), t=jnp.zeros((), jnp.int32))
        return state, self._obs(state.pos)

    def step(
        self, state: FrozenLakeState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[FrozenLakeState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        if self.slippery:
            # Intended action or one of its two perpendicular neighbours, 1/3 each.
            slip = jax.random.randint(key, (), -1, 2)  # {-1, 0, 1}
            a = (a + slip) % 4
        row, col = state.pos // self.size, state.pos % self.size
        delta = _DELTAS[a]
        row = jnp.clip(row + delta[0], 0, self.size - 1)
        col = jnp.clip(col + delta[1], 0, self.size - 1)
        pos = row * self.size + col
        holes, goals = self._cell_flags()
        reached_goal = goals[pos]
        fell = holes[pos]
        t = state.t + 1
        terminated = reached_goal | fell
        truncated = jnp.logical_and(t >= self.max_steps, jnp.logical_not(terminated))
        result = ActionResult(
            observation=self._obs(pos),
            reward=jnp.where(reached_goal, 1.0, 0.0).astype(jnp.float32),
            terminated=terminated,
            truncated=truncated,
        )
        return FrozenLakeState(pos=pos, t=t), result
