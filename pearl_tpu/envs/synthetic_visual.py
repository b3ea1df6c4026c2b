"""Atari-shaped synthetic frame environment for CNN-path measurement.

The real Atari experiments (reference benchmark_config.py:1462-1676 +
atari_wrappers.py preprocessing to 84x84x4 stacked grayscale frames) need the
ALE emulator, which cannot run on-device (docs/ROADMAP.md). This env produces
frames of the SAME shape from a cheap procedural generator (a phase-shifted
sinusoid grid — ~1 flop/pixel, negligible next to the CNN's ~5 MFLOP/frame
forward), so the CNN act+learn path can be measured at Atari-native scale on
the chip (PARITY.md MFU table). The reward depends on the action matching a
frame-visible phase bit, so learners have a real (if trivial) signal and the
loss is non-degenerate.

This is a MEASUREMENT device, not a game: use `pearl_tpu.envs.Breakout` for
learning behavior, `examples/atari_dqn.py` for the real-ALE composition.
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
class SyntheticAtariState:
    phase: jnp.ndarray  # f32 scalar, per-env frame-generator phase
    t: jnp.ndarray  # i32 step counter


@dataclasses.dataclass(frozen=True)
class SyntheticAtari(Environment):
    height: int = 84
    width: int = 84
    frames: int = 4
    num_actions: int = 6
    episode_len: int = 128
    # Frame emission dtype ("bfloat16" halves the generator's HBM writes —
    # the cast fuses into the sin grid; the ring/CNN path consumes bf16
    # natively). None keeps float32.
    obs_dtype: object = None

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(self.num_actions)

    @property
    def observation_space(self) -> BoxSpace:
        n = self.height * self.width * self.frames
        return BoxSpace.create(-jnp.ones(n), jnp.ones(n))

    @property
    def max_episode_steps(self) -> int:
        return self.episode_len

    def _obs(self, state: SyntheticAtariState) -> jnp.ndarray:
        h = jnp.arange(self.height, dtype=jnp.float32)[:, None, None]
        w = jnp.arange(self.width, dtype=jnp.float32)[None, :, None]
        f = jnp.arange(self.frames, dtype=jnp.float32)[None, None, :]
        grid = jnp.sin(
            state.phase + 0.11 * h + 0.07 * w + 0.5 * f + 0.31 * state.t
        )
        if self.obs_dtype is not None:
            grid = grid.astype(self.obs_dtype)
        return grid.reshape(-1)

    def reset(self, key: PRNGKey) -> Tuple[SyntheticAtariState, jnp.ndarray]:
        phase = jax.random.uniform(key, (), minval=0.0, maxval=6.28)
        state = SyntheticAtariState(phase=phase, t=jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, state: SyntheticAtariState, action, key: PRNGKey):
        del key
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        # The "right" action is a deterministic function of phase + time that
        # is readable from the frame, so a CNN learner has a real signal.
        target = (
            jnp.floor(state.phase * 10.0).astype(jnp.int32) + state.t
        ) % self.num_actions
        reward = jnp.where(a == target, 1.0, 0.0)
        t = state.t + 1
        new_state = SyntheticAtariState(phase=state.phase, t=t)
        truncated = t >= self.episode_len
        return new_state, ActionResult(
            observation=self._obs(new_state),
            reward=reward,
            terminated=jnp.zeros((), bool),
            truncated=truncated,
        )
