"""CartPole-v1 as a pure JAX environment.

TPU-native replacement for the reference's `GymEnvironment("CartPole-v1")`
(pearl/utils/instantiations/environments/gym_environment.py:64-222): the
classic-control dynamics are re-implemented as a jittable step function so
thousands of instances run in lockstep under `vmap`. Physics constants follow
the standard CartPole-v1 specification (Barto, Sutton & Anderson 1983 /
Gymnasium classic control).
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
class CartPoleState:
    physics: jnp.ndarray  # (4,) = [x, x_dot, theta, theta_dot]
    t: jnp.ndarray  # i32 step count


@dataclasses.dataclass(frozen=True)
class CartPole(Environment):
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    length: float = 0.5  # half pole length
    force_mag: float = 10.0
    tau: float = 0.02
    theta_threshold: float = 12 * 2 * jnp.pi / 360
    x_threshold: float = 2.4
    max_steps: int = 500

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(2)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array(
            [self.x_threshold * 2, jnp.inf, self.theta_threshold * 2, jnp.inf],
            dtype=jnp.float32,
        )
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def reset(self, key: PRNGKey) -> Tuple[CartPoleState, jnp.ndarray]:
        physics = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(physics=physics, t=jnp.zeros((), jnp.int32))
        return state, physics

    def step(
        self, state: CartPoleState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[CartPoleState, ActionResult]:
        del key  # deterministic dynamics
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        x, x_dot, theta, theta_dot = (
            state.physics[0],
            state.physics[1],
            state.physics[2],
            state.physics[3],
        )
        force = jnp.where(a == 1, self.force_mag, -self.force_mag)
        costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length
        temp = (force + polemass_length * theta_dot**2 * sintheta) / total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass
        # Euler integration (gymnasium default).
        x = x + self.tau * x_dot
        x_dot = x_dot + self.tau * xacc
        theta = theta + self.tau * theta_dot
        theta_dot = theta_dot + self.tau * thetaacc

        physics = jnp.stack([x, x_dot, theta, theta_dot])
        t = state.t + 1
        terminated = (
            (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        )
        truncated = jnp.logical_and(t >= self.max_steps, jnp.logical_not(terminated))
        result = ActionResult(
            observation=physics,
            reward=jnp.float32(1.0),
            terminated=terminated,
            truncated=truncated,
        )
        return CartPoleState(physics=physics, t=t), result
