"""Atari preprocessing wrappers (reference: pearl/user_envs/wrappers/atari_wrappers.py:31-185
and the Atari branch of the benchmark env dispatcher, scripts/benchmark_config.py:1679-1747).

These are HOST-side gymnasium wrappers: Atari emulation cannot run on-device,
so (like the reference) the preprocessing stack lives in front of the
`GymEnvironment` adapter and trains through `pearl_tpu.training.host_loop`.
They are written generically — lives are read from `info["lives"]` or
`env.unwrapped.ale.lives()` when an ALE is present — so the stack is fully
unit-testable without a ROM (the image has no ALE; see docs/ROADMAP.md).

The on-device CNN path is exercised by the pure-JAX MinAtar-style Breakout
(`pearl_tpu.envs.breakout`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # gymnasium is optional for the on-device core
    import gymnasium

    _Wrapper = gymnasium.Wrapper
except Exception:  # pragma: no cover
    gymnasium = None
    _Wrapper = object


def _lives(env, info) -> int:
    if isinstance(info, dict) and "lives" in info:
        return int(info["lives"])
    ale = getattr(getattr(env, "unwrapped", env), "ale", None)
    if ale is not None:
        return int(ale.lives())
    return 0


class NoopResetEnv(_Wrapper):
    """Start each episode with a random number (1..noop_max) of no-op steps
    (reference atari_wrappers.py NoopResetEnv), decorrelating initial states.
    """

    def __init__(self, env, noop_max: int = 30, noop_action: int = 0):
        super().__init__(env)
        self.noop_max = noop_max
        self.noop_action = noop_action

    def reset(self, *, seed: Optional[int] = None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        rng = self.np_random if gymnasium is not None else np.random.default_rng(seed)
        n = int(rng.integers(1, self.noop_max + 1))
        for _ in range(n):
            obs, _, terminated, truncated, info = self.env.step(self.noop_action)
            if terminated or truncated:
                obs, info = self.env.reset(seed=seed, options=options)
        return obs, info


class FireResetEnv(_Wrapper):
    """Press FIRE after reset for games that stall until it is pressed
    (reference atari_wrappers.py FireResetEnv)."""

    def __init__(self, env, fire_action: int = 1):
        super().__init__(env)
        self.fire_action = fire_action

    def reset(self, *, seed: Optional[int] = None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        obs, _, terminated, truncated, info = self.env.step(self.fire_action)
        if terminated or truncated:
            obs, info = self.env.reset(seed=seed, options=options)
        return obs, info


class EpisodicLifeEnv(_Wrapper):
    """Report life loss as episode termination (better value bootstrapping)
    while only truly resetting the emulator on game over
    (reference atari_wrappers.py EpisodicLifeEnv)."""

    def __init__(self, env):
        super().__init__(env)
        self.lives = 0
        self.was_real_done = True

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self.was_real_done = bool(terminated or truncated)
        lives = _lives(self.env, info)
        if 0 < lives < self.lives:
            terminated = True
        self.lives = lives
        return obs, reward, terminated, truncated, info

    def reset(self, *, seed: Optional[int] = None, options=None):
        if self.was_real_done:
            obs, info = self.env.reset(seed=seed, options=options)
        else:
            # Continue the current game from the life-loss state.
            obs, _, terminated, truncated, info = self.env.step(0)
            if terminated or truncated:
                obs, info = self.env.reset(seed=seed, options=options)
        self.lives = _lives(self.env, info)
        return obs, info


class MaxAndSkipEnv(_Wrapper):
    """Repeat each action `skip` frames, return the sum of rewards and the
    pixel-wise max of the last two frames (flicker removal)
    (reference atari_wrappers.py MaxAndSkipEnv)."""

    def __init__(self, env, skip: int = 4):
        super().__init__(env)
        self.skip = skip
        self._frames = None  # (2,) + obs shape, allocated lazily

    def step(self, action):
        total = 0.0
        terminated = truncated = False
        info = {}
        for i in range(self.skip):
            obs, reward, terminated, truncated, info = self.env.step(action)
            obs = np.asarray(obs)
            if self._frames is None:
                self._frames = np.zeros((2,) + obs.shape, obs.dtype)
            if i >= self.skip - 2:
                self._frames[i - (self.skip - 2)] = obs
            total += float(reward)
            if terminated or truncated:
                break
        return self._frames.max(axis=0), total, terminated, truncated, info

    def reset(self, *, seed: Optional[int] = None, options=None):
        self._frames = None
        return self.env.reset(seed=seed, options=options)


def wrap_atari(
    env,
    *,
    noop_max: int = 30,
    skip: int = 4,
    episodic_life: bool = True,
    fire_reset: bool = True,
):
    """Apply the reference's Atari stack (benchmark_config.py:1679-1747 order:
    NoopReset -> MaxAndSkip -> EpisodicLife -> FireReset when FIRE exists)."""
    env = NoopResetEnv(env, noop_max=noop_max)
    if skip > 1:
        env = MaxAndSkipEnv(env, skip=skip)
    if episodic_life:
        env = EpisodicLifeEnv(env)
    if fire_reset:
        meanings = []
        get_meanings = getattr(getattr(env, "unwrapped", env), "get_action_meanings", None)
        if callable(get_meanings):
            try:
                meanings = list(get_meanings())
            except Exception:
                meanings = []
        if "FIRE" in meanings:
            env = FireResetEnv(env, fire_action=meanings.index("FIRE"))
    return env
