"""Host-side Gymnasium adapter (reference:
pearl/utils/instantiations/environments/gym_environment.py:64-222).

The on-device envs in pearl_tpu.envs are the production path; this adapter
exists for parity checks against real Gymnasium dynamics and for envs that
have no pure-JAX port. It satisfies the same functional API but runs on host
(one env instance, numpy in/out), so it only works with the host training
loop (`pearl_tpu.training.host_loop`), not inside jit."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from pearl_tpu.api.spaces import BoxActionSpace, BoxSpace, DiscreteActionSpace
from pearl_tpu.api.types import ActionResult


@dataclasses.dataclass(eq=False)
class GymEnvironment:
    """`env_name` may also be an already-constructed gymnasium env (e.g. one
    wrapped by `pearl_tpu.envs.atari.wrap_atari`), mirroring the reference's
    GymEnvironment(env_or_env_name) signature (gym_environment.py:70-96)."""

    env_name: object = "CartPole-v1"
    render_mode: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.env_name, str):
            import gymnasium

            self._gym = gymnasium.make(self.env_name, render_mode=self.render_mode)
        else:
            self._gym = self.env_name

    @property
    def action_space(self):
        import gymnasium

        space = self._gym.action_space
        if isinstance(space, gymnasium.spaces.Discrete):
            return DiscreteActionSpace.discrete(int(space.n))
        return BoxActionSpace.create(space.low, space.high)

    @property
    def observation_space(self):
        space = self._gym.observation_space
        return BoxSpace.create(
            np.asarray(space.low, np.float32), np.asarray(space.high, np.float32)
        )

    @property
    def observation_dim(self) -> int:
        return int(np.prod(self._gym.observation_space.shape))

    def reset(self, seed: Optional[int] = None) -> Tuple[None, jnp.ndarray]:
        obs, info = self._gym.reset(seed=seed)
        return None, jnp.asarray(obs, jnp.float32).reshape(-1)

    def step(self, state, action, key=None) -> Tuple[None, ActionResult]:
        import gymnasium

        a = np.asarray(action).reshape(-1)
        if isinstance(self._gym.action_space, gymnasium.spaces.Discrete):
            a = int(a[0])
        obs, reward, terminated, truncated, info = self._gym.step(a)
        cost = info.get("cost")
        return None, ActionResult(
            observation=jnp.asarray(obs, jnp.float32).reshape(-1),
            reward=jnp.float32(reward),
            terminated=jnp.asarray(bool(terminated)),
            truncated=jnp.asarray(bool(truncated)),
            cost=None if cost is None else jnp.float32(cost),
        )

    def close(self):
        self._gym.close()
