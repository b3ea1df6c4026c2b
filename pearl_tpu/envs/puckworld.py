"""PuckWorld as a pure JAX environment.

The reference exposes PuckWorld only through the PLE pygame emulator
(gym registration in pearl/user_envs/__init__.py:9-51; partial-observability
wrapper pearl/user_envs/wrappers/partial_observability.py PuckWorld variant).
A pygame emulator cannot run on-device, so this is a faithful on-device
reimplementation of the PLE dynamics (unit square, 5 discrete accelerations,
friction, a relocating "good" target and a pursuing "bad" creep with a
penalty disc), vmappable to thousands of instances.

Observation (8,): [agent_x, agent_y, vel_x, vel_y, good_x, good_y,
bad_x, bad_y] — same state layout PLE's getGameState returns, so the
reference's partial-observability experiments (hide velocities: indices
(0, 1, 4, 5, 6, 7)) transfer directly via PartialObservabilityWrapper.
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
class PuckWorldState:
    pos: jnp.ndarray  # (2,) agent position in [0, 1]^2
    vel: jnp.ndarray  # (2,)
    good: jnp.ndarray  # (2,) target position
    bad: jnp.ndarray  # (2,) pursuing creep position
    t: jnp.ndarray  # i32 step counter


@dataclasses.dataclass(frozen=True)
class PuckWorld(Environment):
    """Actions: 0=noop, 1=left, 2=right, 3=up, 4=down (PLE's action set)."""

    accel: float = 0.08  # per-step acceleration impulse
    friction: float = 0.95  # velocity retained per step
    bad_speed: float = 0.01  # creep pursuit speed per step
    bad_radius: float = 0.3  # penalty disc radius
    good_relocate_steps: int = 300  # PLE relocates the target every ~300 ticks
    max_steps: int = 1000

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(5)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1, 1, 1, 1, 1, 1, 1, 1], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, s: PuckWorldState) -> jnp.ndarray:
        return jnp.concatenate([s.pos, s.vel, s.good, s.bad]).astype(jnp.float32)

    def reset(self, key: PRNGKey) -> Tuple[PuckWorldState, jnp.ndarray]:
        kp, kg, kb = jax.random.split(key, 3)
        state = PuckWorldState(
            pos=jax.random.uniform(kp, (2,)),
            vel=jnp.zeros((2,)),
            good=jax.random.uniform(kg, (2,)),
            bad=jax.random.uniform(kb, (2,)),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(
        self, state: PuckWorldState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[PuckWorldState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        # Acceleration lookup: noop/left/right/up/down.
        dirs = jnp.array(
            [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, -1.0]],
            dtype=jnp.float32,
        )
        vel = state.vel * self.friction + dirs[a] * self.accel
        pos = state.pos + vel
        # Walls: clamp position and zero the offending velocity component.
        hit = (pos < 0.0) | (pos > 1.0)
        pos = jnp.clip(pos, 0.0, 1.0)
        vel = jnp.where(hit, 0.0, vel)

        # Bad creep pursues the agent at constant speed.
        to_agent = pos - state.bad
        dist_bad_prev = jnp.linalg.norm(to_agent) + 1e-8
        bad = state.bad + to_agent / dist_bad_prev * self.bad_speed

        # Good target relocates on a fixed cadence.
        t = state.t + 1
        k_good, _ = jax.random.split(key)
        relocate = (t % self.good_relocate_steps) == 0
        good = jnp.where(relocate, jax.random.uniform(k_good, (2,)), state.good)

        # PLE reward: -distance to target, extra penalty inside the creep disc.
        dist_good = jnp.linalg.norm(pos - good)
        dist_bad = jnp.linalg.norm(pos - bad)
        penalty = jnp.where(
            dist_bad < self.bad_radius,
            -2.0 * (self.bad_radius - dist_bad) / self.bad_radius,
            0.0,
        )
        reward = -dist_good + penalty

        new_state = PuckWorldState(pos=pos, vel=vel, good=good, bad=bad, t=t)
        result = ActionResult(
            observation=self._obs(new_state),
            reward=reward.astype(jnp.float32),
            terminated=jnp.zeros((), jnp.bool_),
            truncated=t >= self.max_steps,
        )
        return new_state, result
