"""Additional classic-control environments: MountainCar (discrete +
continuous) and Acrobot, as pure JAX step functions (standard Gymnasium
dynamics; used by the reference's benchmark registry via GymEnvironment,
pearl/utils/scripts/benchmark_config.py)."""

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
class MountainCarState:
    position: jnp.ndarray
    velocity: jnp.ndarray
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MountainCar(Environment):
    min_position: float = -1.2
    max_position: float = 0.6
    max_speed: float = 0.07
    goal_position: float = 0.5
    force: float = 0.001
    gravity: float = 0.0025
    max_steps: int = 200

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(3)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(
            jnp.array([self.min_position, -self.max_speed]),
            jnp.array([self.max_position, self.max_speed]),
        )

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def reset(self, key: PRNGKey):
        position = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(
            position=position, velocity=jnp.zeros(()), t=jnp.zeros((), jnp.int32)
        )
        return state, jnp.stack([state.position, state.velocity])

    def step(self, state, action, key):
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        velocity = state.velocity + (a - 1) * self.force - jnp.cos(
            3 * state.position
        ) * self.gravity
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity, self.min_position, self.max_position)
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        terminated = position >= self.goal_position
        truncated = jnp.logical_and(t >= self.max_steps, jnp.logical_not(terminated))
        new_state = MountainCarState(position=position, velocity=velocity, t=t)
        result = ActionResult(
            observation=jnp.stack([position, velocity]),
            reward=jnp.float32(-1.0),
            terminated=terminated,
            truncated=truncated,
        )
        return new_state, result


@dataclasses.dataclass(frozen=True)
class ContinuousMountainCar(MountainCar):
    power: float = 0.0015
    max_steps: int = 999

    @property
    def action_space(self) -> BoxActionSpace:
        return BoxActionSpace.create(-1.0, 1.0)

    def reset(self, key: PRNGKey):
        position = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(
            position=position, velocity=jnp.zeros(()), t=jnp.zeros((), jnp.int32)
        )
        return state, jnp.stack([state.position, state.velocity])

    def step(self, state, action, key):
        force = jnp.clip(jnp.reshape(action, (-1,))[0], -1.0, 1.0)
        velocity = state.velocity + force * self.power - 0.0025 * jnp.cos(
            3 * state.position
        )
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity, self.min_position, self.max_position)
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        terminated = position >= 0.45
        truncated = jnp.logical_and(t >= self.max_steps, jnp.logical_not(terminated))
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        new_state = MountainCarState(position=position, velocity=velocity, t=t)
        result = ActionResult(
            observation=jnp.stack([position, velocity]),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
        )
        return new_state, result


@struct.dataclass
class AcrobotState:
    theta1: jnp.ndarray
    theta2: jnp.ndarray
    dtheta1: jnp.ndarray
    dtheta2: jnp.ndarray
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Acrobot(Environment):
    """Two-link underactuated pendulum, RK4 integration (Gymnasium 'book'
    dynamics)."""

    dt: float = 0.2
    link_length_1: float = 1.0
    link_mass_1: float = 1.0
    link_mass_2: float = 1.0
    link_com_1: float = 0.5
    link_com_2: float = 0.5
    link_moi: float = 1.0
    max_vel_1: float = 4 * jnp.pi
    max_vel_2: float = 9 * jnp.pi
    max_steps: int = 500

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(3)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1.0, 1.0, 1.0, 1.0, self.max_vel_1, self.max_vel_2])
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, s: AcrobotState) -> jnp.ndarray:
        return jnp.stack(
            [
                jnp.cos(s.theta1),
                jnp.sin(s.theta1),
                jnp.cos(s.theta2),
                jnp.sin(s.theta2),
                s.dtheta1,
                s.dtheta2,
            ]
        )

    def reset(self, key: PRNGKey):
        vals = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(
            theta1=vals[0],
            theta2=vals[1],
            dtheta1=vals[2],
            dtheta2=vals[3],
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def _dsdt(self, s: jnp.ndarray, torque: jnp.ndarray) -> jnp.ndarray:
        m1, m2 = self.link_mass_1, self.link_mass_2
        l1 = self.link_length_1
        lc1, lc2 = self.link_com_1, self.link_com_2
        I1 = I2 = self.link_moi
        g = 9.8
        theta1, theta2, dtheta1, dtheta2 = s[0], s[1], s[2], s[3]
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
            + I1
            + I2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + I2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        ddtheta2 = (
            torque
            + d2 / d1 * phi1
            - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2)
            - phi2
        ) / (m2 * lc2**2 + I2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])

    def step(self, state, action, key):
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        torque = (a - 1).astype(jnp.float32)  # {-1, 0, 1}
        s0 = jnp.stack([state.theta1, state.theta2, state.dtheta1, state.dtheta2])

        # RK4 over one dt.
        def f(s):
            return self._dsdt(s, torque)

        k1 = f(s0)
        k2 = f(s0 + self.dt / 2 * k1)
        k3 = f(s0 + self.dt / 2 * k2)
        k4 = f(s0 + self.dt * k3)
        s1 = s0 + self.dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

        wrap = lambda x: ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        theta1, theta2 = wrap(s1[0]), wrap(s1[1])
        dtheta1 = jnp.clip(s1[2], -self.max_vel_1, self.max_vel_1)
        dtheta2 = jnp.clip(s1[3], -self.max_vel_2, self.max_vel_2)
        t = state.t + 1
        terminated = -jnp.cos(theta1) - jnp.cos(theta2 + theta1) > 1.0
        truncated = jnp.logical_and(t >= self.max_steps, jnp.logical_not(terminated))
        new_state = AcrobotState(
            theta1=theta1, theta2=theta2, dtheta1=dtheta1, dtheta2=dtheta2, t=t
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=jnp.where(terminated, 0.0, -1.0),
            terminated=terminated,
            truncated=truncated,
        )
        return new_state, result
