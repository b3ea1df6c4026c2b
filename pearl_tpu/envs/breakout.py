"""MinAtar-style Breakout as a pure JAX environment (10x10 grid, 4 feature
channels), in the spirit of Young & Tian's MinAtar. Serves as the image-input
testbed for the CNN network family (the reference's Atari stack,
pearl/user_envs/wrappers/atari_wrappers.py + CNN Q-networks, requires an ALE
emulator that cannot run on-device; this env exercises the same CNN code path
with pure-JAX dynamics).

Observation: (rows * cols * 4,) flattened float grid with channels
[paddle, ball, ball-trail, bricks]; CNN networks reshape via their
`input_shape=(10, 10, 4)`.
Actions: 0 = left, 1 = stay, 2 = right.
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
class BreakoutState:
    ball: jnp.ndarray  # (2,) i32 [row, col]
    last_ball: jnp.ndarray  # (2,) i32
    ddir: jnp.ndarray  # (2,) i32 in {-1, 1}^2
    paddle: jnp.ndarray  # i32 column
    bricks: jnp.ndarray  # (3, C) bool
    t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Breakout(Environment):
    rows: int = 10
    cols: int = 10
    brick_rows: int = 3
    max_steps: int = 500

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(3)

    @property
    def observation_space(self) -> BoxSpace:
        n = self.rows * self.cols * 4
        return BoxSpace.create(jnp.zeros(n), jnp.ones(n))

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, s: BreakoutState) -> jnp.ndarray:
        grid = jnp.zeros((self.rows, self.cols, 4))
        grid = grid.at[self.rows - 1, s.paddle, 0].set(1.0)
        grid = grid.at[s.ball[0], s.ball[1], 1].set(1.0)
        grid = grid.at[s.last_ball[0], s.last_ball[1], 2].set(1.0)
        brick_grid = jnp.zeros((self.rows, self.cols))
        brick_grid = brick_grid.at[1 : 1 + self.brick_rows, :].set(
            s.bricks.astype(jnp.float32)
        )
        grid = grid.at[:, :, 3].set(brick_grid)
        return grid.reshape(-1)

    def reset(self, key: PRNGKey) -> Tuple[BreakoutState, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        col = jax.random.randint(k1, (), 0, self.cols)
        ddir = jnp.stack(
            [jnp.ones((), jnp.int32), jax.random.choice(k2, jnp.array([-1, 1]))]
        )
        ball = jnp.array([self.brick_rows + 1, 0], jnp.int32).at[1].set(col)
        state = BreakoutState(
            ball=ball,
            last_ball=ball,
            ddir=ddir,
            paddle=jnp.asarray(self.cols // 2, jnp.int32),
            bricks=jnp.ones((self.brick_rows, self.cols), bool),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(self, state: BreakoutState, action, key: PRNGKey):
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        paddle = jnp.clip(state.paddle + (a - 1), 0, self.cols - 1)

        ball, ddir = state.ball, state.ddir
        # Horizontal wall bounce.
        ncol = ball[1] + ddir[1]
        bounce_h = (ncol < 0) | (ncol >= self.cols)
        dcol = jnp.where(bounce_h, -ddir[1], ddir[1])
        ncol = ball[1] + dcol
        # Vertical: ceiling bounce.
        nrow = ball[0] + ddir[0]
        bounce_top = nrow < 0
        drow = jnp.where(bounce_top, -ddir[0], ddir[0])
        nrow = ball[0] + drow

        # Brick collision: new position inside brick band with live brick.
        in_band = (nrow >= 1) & (nrow < 1 + self.brick_rows)
        brick_r = jnp.clip(nrow - 1, 0, self.brick_rows - 1)
        hit = in_band & state.bricks[brick_r, ncol]
        bricks = state.bricks.at[brick_r, ncol].set(
            jnp.where(hit, False, state.bricks[brick_r, ncol])
        )
        reward = hit.astype(jnp.float32)
        # Bounce down off a brick.
        drow = jnp.where(hit, -drow, drow)
        nrow = jnp.where(hit, ball[0] + drow, nrow)

        # Paddle bounce at the bottom row.
        at_bottom = nrow >= self.rows - 1
        on_paddle = at_bottom & (ncol == paddle)
        drow = jnp.where(on_paddle, -1, drow)
        nrow = jnp.where(on_paddle, self.rows - 2, nrow)
        missed = at_bottom & jnp.logical_not(on_paddle)

        # All bricks cleared -> fresh wall (MinAtar behavior).
        cleared = jnp.logical_not(jnp.any(bricks))
        bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)

        new_state = BreakoutState(
            ball=jnp.stack([jnp.clip(nrow, 0, self.rows - 1), ncol]).astype(jnp.int32),
            last_ball=ball,
            ddir=jnp.stack([drow, dcol]).astype(jnp.int32),
            paddle=paddle,
            bricks=bricks,
            t=state.t + 1,
        )
        terminated = missed
        truncated = jnp.logical_and(
            new_state.t >= self.max_steps, jnp.logical_not(terminated)
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
        )
        return new_state, result
