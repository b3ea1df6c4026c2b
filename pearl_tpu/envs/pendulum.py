"""Pendulum-v1 as a pure JAX environment (continuous control).

TPU-native replacement for `GymEnvironment("Pendulum-v1")` used by the
reference's continuous-control integration tests
(test/integration/test_integration.py:631-895). Standard Gymnasium dynamics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxActionSpace, BoxSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


def _angle_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


@struct.dataclass
class PendulumState:
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Pendulum(Environment):
    max_speed: float = 8.0
    max_torque: float = 2.0
    dt: float = 0.05
    g: float = 10.0
    m: float = 1.0
    l: float = 1.0
    max_steps: int = 200
    # When True, `cost` mirrors the reference's gym_avg_torque_cost wrapper
    # (pearl/user_envs/wrappers/gym_avg_torque_cost.py:17-28): cost = mean(a^2),
    # with actions normalized to [-1, 1].
    emit_torque_cost: bool = False

    @property
    def action_space(self) -> BoxActionSpace:
        return BoxActionSpace.create(-self.max_torque, self.max_torque)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1.0, 1.0, self.max_speed], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, theta, theta_dot):
        return jnp.stack([jnp.cos(theta), jnp.sin(theta), theta_dot])

    def reset(self, key: PRNGKey) -> Tuple[PendulumState, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = PendulumState(theta=theta, theta_dot=theta_dot, t=jnp.zeros((), jnp.int32))
        return state, self._obs(theta, theta_dot)

    def step(
        self, state: PendulumState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[PendulumState, ActionResult]:
        del key
        u = jnp.clip(jnp.reshape(action, (-1,))[0], -self.max_torque, self.max_torque)
        th, thdot = state.theta, state.theta_dot
        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3 * self.g / (2 * self.l) * jnp.sin(th) + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        t = state.t + 1
        truncated = t >= self.max_steps
        torque_cost = (u / self.max_torque) ** 2
        result = ActionResult(
            observation=self._obs(newth, newthdot),
            reward=-cost,
            terminated=jnp.zeros((), jnp.bool_),
            truncated=truncated,
            cost=torque_cost if self.emit_torque_cost else None,
        )
        return PendulumState(theta=newth, theta_dot=newthdot, t=t), result
