"""The remaining PLE (PyGame Learning Environment) games as pure JAX envs.

The reference registers five PLE games — Catcher, FlappyBird, Pixelcopter,
PuckWorld, Pong — through the pygame emulator (gym registration in
pearl/user_envs/__init__.py:9-51, incl. *-PLE-500-v0 variants capped at 500
steps). PuckWorld lives in envs/puckworld.py; this module covers the other
four. A pygame emulator cannot run on-device, so these are on-device
reimplementations of the PLE dynamics using PLE's *non-visual state vector*
layout (the same feature order `ple.getGameState()` returns), normalized to
the unit square so they are resolution-independent. All are vmappable to
thousands of instances and step entirely under `jit`.

Reward conventions follow PLE's defaults: +1 for a "positive" event (catch a
fruit / pass a pipe or gate / score a point), -1 for a "negative" event
(miss / concede a point), -5 for a terminal "loss" (crash / out of lives).
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


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Catcher
# ---------------------------------------------------------------------------


@struct.dataclass
class CatcherState:
    player_x: jnp.ndarray  # f32 paddle center in [0, 1]
    player_vel: jnp.ndarray  # f32 horizontal velocity
    fruit_x: jnp.ndarray  # f32 fruit center in [0, 1]
    fruit_y: jnp.ndarray  # f32 fruit height, 0 = top, 1 = bottom (paddle line)
    lives: jnp.ndarray  # i32 remaining lives
    t: jnp.ndarray  # i32 step counter


@dataclasses.dataclass(frozen=True)
class Catcher(Environment):
    """PLE Catcher: move a paddle to catch falling fruit.

    Actions: 0=left, 1=right, 2=noop (PLE action set {left, right} + None).
    Observation (4,): [player_x, player_vel, fruit_x, fruit_y] — PLE's
    getGameState order. +1 on catch, -1 on miss (lose a life), -5 and
    terminate when the last of `init_lives` lives is lost.
    """

    accel: float = 0.021  # PLE: player speed = 0.021 * width per tick
    friction: float = 0.9
    fruit_speed: float = 0.01  # fall per tick (≈100 ticks top→bottom)
    paddle_halfwidth: float = 0.1
    init_lives: int = 3
    max_steps: int = 500  # Catcher-PLE-500-v0 cap

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(3)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1.0, 1.0, 1.0, 1.0], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, s: CatcherState) -> jnp.ndarray:
        return jnp.stack([s.player_x, s.player_vel, s.fruit_x, s.fruit_y]).astype(
            jnp.float32
        )

    def reset(self, key: PRNGKey) -> Tuple[CatcherState, jnp.ndarray]:
        kf, _ = jax.random.split(key)
        state = CatcherState(
            player_x=_f32(0.5),
            player_vel=_f32(0.0),
            fruit_x=jax.random.uniform(kf, (), minval=0.05, maxval=0.95),
            fruit_y=_f32(0.0),
            lives=jnp.asarray(self.init_lives, jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(
        self, state: CatcherState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[CatcherState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        direction = jnp.array([-1.0, 1.0, 0.0], dtype=jnp.float32)[a]
        vel = state.player_vel * self.friction + direction * self.accel
        x = state.player_x + vel
        hit_wall = (x < 0.0) | (x > 1.0)
        x = jnp.clip(x, 0.0, 1.0)
        vel = jnp.where(hit_wall, 0.0, vel)

        fruit_y = state.fruit_y + self.fruit_speed
        landed = fruit_y >= 1.0
        caught = landed & (jnp.abs(state.fruit_x - x) <= self.paddle_halfwidth)
        missed = landed & ~caught

        lives = state.lives - missed.astype(jnp.int32)
        dead = lives <= 0
        reward = jnp.where(caught, 1.0, 0.0) + jnp.where(
            missed, jnp.where(dead, -5.0, -1.0), 0.0
        )

        # Respawn the fruit at a fresh random column whenever it lands.
        new_fruit_x = jax.random.uniform(key, (), minval=0.05, maxval=0.95)
        fruit_x = jnp.where(landed, new_fruit_x, state.fruit_x)
        fruit_y = jnp.where(landed, 0.0, fruit_y)

        t = state.t + 1
        new_state = CatcherState(
            player_x=x, player_vel=vel, fruit_x=fruit_x, fruit_y=fruit_y,
            lives=lives, t=t,
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=_f32(reward),
            terminated=dead,
            truncated=t >= self.max_steps,
        )
        return new_state, result


# ---------------------------------------------------------------------------
# FlappyBird
# ---------------------------------------------------------------------------


@struct.dataclass
class FlappyBirdState:
    player_y: jnp.ndarray  # f32 in [0, 1], 0 = top
    player_vel: jnp.ndarray  # f32 vertical velocity (+down)
    pipe_x: jnp.ndarray  # (2,) f32 pipe horizontal positions (can be > 1)
    gap_y: jnp.ndarray  # (2,) f32 gap centers
    t: jnp.ndarray  # i32


@dataclasses.dataclass(frozen=True)
class FlappyBird(Environment):
    """PLE FlappyBird: flap to fly through pipe gaps.

    Actions: 0=flap (upward impulse), 1=noop (gravity).
    Observation (8,): [player_y, player_vel,
    next_pipe_dist, next_pipe_top_y, next_pipe_bottom_y,
    next_next_pipe_dist, next_next_pipe_top_y, next_next_pipe_bottom_y] —
    PLE's getGameState order. +1 per pipe passed, -5 and terminate on
    crash (gap edge, floor, or ceiling).
    """

    gravity: float = 0.004
    flap_impulse: float = -0.025
    max_vel: float = 0.05
    scroll_speed: float = 0.02  # pipes move left per tick
    pipe_spacing: float = 0.75  # horizontal distance between pipes
    gap_halfheight: float = 0.12
    player_x: float = 0.2  # fixed bird column
    max_steps: int = 500  # FlappyBird-PLE-500-v0 cap

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(2)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1, 1, 2, 1, 1, 2, 1, 1], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _order(self, s: FlappyBirdState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Indices of the next / next-next pipe ahead of the bird."""
        dist = s.pipe_x - self.player_x
        # A pipe already behind the bird sorts last.
        sort_key = jnp.where(dist < -0.05, jnp.inf, dist)
        first = jnp.argmin(sort_key)
        return first, 1 - first

    def _obs(self, s: FlappyBirdState) -> jnp.ndarray:
        i, j = self._order(s)
        return jnp.stack(
            [
                s.player_y,
                s.player_vel,
                s.pipe_x[i] - self.player_x,
                s.gap_y[i] - self.gap_halfheight,
                s.gap_y[i] + self.gap_halfheight,
                s.pipe_x[j] - self.player_x,
                s.gap_y[j] - self.gap_halfheight,
                s.gap_y[j] + self.gap_halfheight,
            ]
        ).astype(jnp.float32)

    def reset(self, key: PRNGKey) -> Tuple[FlappyBirdState, jnp.ndarray]:
        g1, g2 = jax.random.split(key)
        gap = lambda k: jax.random.uniform(k, (), minval=0.25, maxval=0.75)
        state = FlappyBirdState(
            player_y=_f32(0.5),
            player_vel=_f32(0.0),
            pipe_x=jnp.array([1.0, 1.0 + self.pipe_spacing], dtype=jnp.float32),
            gap_y=jnp.stack([gap(g1), gap(g2)]).astype(jnp.float32),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(
        self, state: FlappyBirdState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[FlappyBirdState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        flap = a == 0
        vel = jnp.where(flap, self.flap_impulse, state.player_vel + self.gravity)
        vel = jnp.clip(vel, -self.max_vel, self.max_vel)
        y = state.player_y + vel

        pipe_x = state.pipe_x - self.scroll_speed
        # +1 for each pipe whose trailing edge crossed the bird this tick.
        passed = (pipe_x < self.player_x) & (state.pipe_x >= self.player_x)
        n_passed = jnp.sum(passed.astype(jnp.float32))

        # Recycle pipes that scrolled off-screen to the right of the farthest.
        recycle = pipe_x < -0.1
        far = jnp.max(pipe_x)
        new_gaps = jax.random.uniform(key, (2,), minval=0.25, maxval=0.75)
        pipe_x = jnp.where(recycle, far + self.pipe_spacing, pipe_x)
        gap_y = jnp.where(recycle, new_gaps, state.gap_y)

        # Collision: bird column overlaps a pipe column and y outside the gap.
        in_pipe = jnp.abs(pipe_x - self.player_x) < 0.05
        outside_gap = jnp.abs(y - gap_y) > self.gap_halfheight
        crashed = jnp.any(in_pipe & outside_gap) | (y < 0.0) | (y > 1.0)

        reward = n_passed + jnp.where(crashed, -5.0, 0.0)
        t = state.t + 1
        new_state = FlappyBirdState(
            player_y=jnp.clip(y, 0.0, 1.0), player_vel=vel,
            pipe_x=pipe_x, gap_y=gap_y, t=t,
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=_f32(reward),
            terminated=crashed,
            truncated=t >= self.max_steps,
        )
        return new_state, result


# ---------------------------------------------------------------------------
# Pixelcopter
# ---------------------------------------------------------------------------


@struct.dataclass
class PixelcopterState:
    player_y: jnp.ndarray  # f32 in [0, 1]
    player_vel: jnp.ndarray  # f32 (+down)
    phase: jnp.ndarray  # f32 cavern sine phase (advances with scroll)
    gate_x: jnp.ndarray  # f32 next gate distance ahead of the copter
    gate_y: jnp.ndarray  # f32 gate block gap center
    t: jnp.ndarray  # i32


@dataclasses.dataclass(frozen=True)
class Pixelcopter(Environment):
    """PLE Pixelcopter: tap-to-rise helicopter through a sinusoidal cavern.

    Actions: 0=tap (upward impulse), 1=noop (gravity).
    Observation (7,): [player_y, player_vel, dist_to_ceiling, dist_to_floor,
    next_gate_dist, next_gate_block_top, next_gate_block_bottom] — PLE's
    getGameState order. +1 per gate passed, -5 and terminate on hitting
    the cavern walls or a gate block.
    """

    gravity: float = 0.004
    tap_impulse: float = -0.02
    max_vel: float = 0.04
    scroll_speed: float = 0.02
    cavern_halfheight: float = 0.3  # half-gap of the cavern around its center
    cavern_amp: float = 0.15  # sine amplitude of the cavern center
    cavern_freq: float = 0.8  # phase advance per unit scrolled
    gate_spacing: float = 1.0  # distance between gates
    gate_halfgap: float = 0.15  # half-height of the opening in a gate block
    max_steps: int = 500  # Pixelcopter-PLE-500-v0 cap

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(2)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1, 1, 1, 1, 2, 1, 1], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _walls(self, phase: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        center = 0.5 + self.cavern_amp * jnp.sin(phase)
        return center - self.cavern_halfheight, center + self.cavern_halfheight

    def _obs(self, s: PixelcopterState) -> jnp.ndarray:
        ceil, floor = self._walls(s.phase)
        return jnp.stack(
            [
                s.player_y,
                s.player_vel,
                s.player_y - ceil,
                floor - s.player_y,
                s.gate_x,
                s.gate_y - self.gate_halfgap,
                s.gate_y + self.gate_halfgap,
            ]
        ).astype(jnp.float32)

    def reset(self, key: PRNGKey) -> Tuple[PixelcopterState, jnp.ndarray]:
        kp, kg = jax.random.split(key)
        state = PixelcopterState(
            player_y=_f32(0.5),
            player_vel=_f32(0.0),
            phase=jax.random.uniform(kp, (), minval=0.0, maxval=2.0 * jnp.pi),
            gate_x=_f32(self.gate_spacing),
            gate_y=jax.random.uniform(kg, (), minval=0.35, maxval=0.65),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(
        self, state: PixelcopterState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[PixelcopterState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        tap = a == 0
        vel = jnp.where(
            tap, state.player_vel + self.tap_impulse, state.player_vel + self.gravity
        )
        vel = jnp.clip(vel, -self.max_vel, self.max_vel)
        y = state.player_y + vel

        phase = state.phase + self.cavern_freq * self.scroll_speed * 2.0 * jnp.pi
        gate_x = state.gate_x - self.scroll_speed
        passed = gate_x < 0.0
        in_gate = jnp.abs(gate_x) < 0.04
        hit_block = in_gate & (jnp.abs(y - state.gate_y) > self.gate_halfgap)

        ceil, floor = self._walls(phase)
        crashed = hit_block | (y <= ceil) | (y >= floor)

        new_gate_y = jax.random.uniform(key, (), minval=0.35, maxval=0.65)
        gate_y = jnp.where(passed, new_gate_y, state.gate_y)
        gate_x = jnp.where(passed, gate_x + self.gate_spacing, gate_x)

        reward = jnp.where(passed, 1.0, 0.0) + jnp.where(crashed, -5.0, 0.0)
        t = state.t + 1
        new_state = PixelcopterState(
            player_y=y, player_vel=vel, phase=phase,
            gate_x=gate_x, gate_y=gate_y, t=t,
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=_f32(reward),
            terminated=crashed,
            truncated=t >= self.max_steps,
        )
        return new_state, result


# ---------------------------------------------------------------------------
# Pong
# ---------------------------------------------------------------------------


@struct.dataclass
class PongState:
    player_y: jnp.ndarray  # f32 agent paddle center (left side), [0, 1]
    player_vel: jnp.ndarray  # f32
    cpu_y: jnp.ndarray  # f32 cpu paddle center (right side)
    ball: jnp.ndarray  # (2,) f32 ball position
    ball_vel: jnp.ndarray  # (2,) f32 ball velocity
    player_score: jnp.ndarray  # i32
    cpu_score: jnp.ndarray  # i32
    t: jnp.ndarray  # i32


@dataclasses.dataclass(frozen=True)
class Pong(Environment):
    """PLE Pong: agent paddle (left) vs a ball-tracking CPU paddle (right).

    Actions: 0=up, 1=down, 2=noop.
    Observation (7,): [player_y, player_vel, cpu_y, ball_x, ball_y,
    ball_vel_x, ball_vel_y] — PLE's getGameState order. +1 when the agent
    scores, -1 when the CPU scores; the match ends when either side reaches
    `max_score` (PLE's MAX_SCORE), or at the 500-step cap.
    """

    accel: float = 0.015
    friction: float = 0.9
    paddle_halfheight: float = 0.1
    ball_speed: float = 0.03
    cpu_speed: float = 0.012  # cpu tracking speed (beatable)
    max_score: int = 5
    max_steps: int = 500  # Pong-PLE-500-v0 cap

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(3)

    @property
    def observation_space(self) -> BoxSpace:
        high = jnp.array([1, 1, 1, 1, 1, 1, 1], dtype=jnp.float32)
        return BoxSpace.create(-high, high)

    @property
    def max_episode_steps(self) -> int:
        return self.max_steps

    def _obs(self, s: PongState) -> jnp.ndarray:
        return jnp.concatenate(
            [
                jnp.stack([s.player_y, s.player_vel, s.cpu_y]),
                s.ball,
                s.ball_vel,
            ]
        ).astype(jnp.float32)

    def _serve(self, key: PRNGKey, toward_player: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ball at center, random ±30° angle, serving toward the given side."""
        ang = jax.random.uniform(key, (), minval=-0.5, maxval=0.5)
        sign = jnp.where(toward_player, -1.0, 1.0)
        vel = self.ball_speed * jnp.stack([sign * jnp.cos(ang), jnp.sin(ang)])
        return jnp.array([0.5, 0.5], dtype=jnp.float32), vel.astype(jnp.float32)

    def reset(self, key: PRNGKey) -> Tuple[PongState, jnp.ndarray]:
        ball, ball_vel = self._serve(key, jnp.asarray(True))
        state = PongState(
            player_y=_f32(0.5),
            player_vel=_f32(0.0),
            cpu_y=_f32(0.5),
            ball=ball,
            ball_vel=ball_vel,
            player_score=jnp.zeros((), jnp.int32),
            cpu_score=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(
        self, state: PongState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[PongState, ActionResult]:
        a = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        direction = jnp.array([-1.0, 1.0, 0.0], dtype=jnp.float32)[a]
        vel = state.player_vel * self.friction + direction * self.accel
        player_y = jnp.clip(state.player_y + vel, 0.0, 1.0)

        # CPU tracks the ball at bounded speed.
        cpu_y = state.cpu_y + jnp.clip(
            state.ball[1] - state.cpu_y, -self.cpu_speed, self.cpu_speed
        )

        ball = state.ball + state.ball_vel
        bvel = state.ball_vel
        # Top/bottom wall bounce.
        bounce = (ball[1] < 0.0) | (ball[1] > 1.0)
        bvel = bvel.at[1].set(jnp.where(bounce, -bvel[1], bvel[1]))
        ball = ball.at[1].set(jnp.clip(ball[1], 0.0, 1.0))

        # Paddle bounces (player at x=0.05, cpu at x=0.95): reflect x and add
        # english proportional to where the ball struck the paddle.
        def paddle_bounce(ball, bvel, paddle_y, at_left):
            plane = 0.05 if at_left else 0.95
            crossing = (ball[0] < plane) if at_left else (ball[0] > plane)
            moving_out = (bvel[0] < 0) if at_left else (bvel[0] > 0)
            hit = crossing & moving_out & (
                jnp.abs(ball[1] - paddle_y) <= self.paddle_halfheight
            )
            bvel = bvel.at[0].set(jnp.where(hit, -bvel[0], bvel[0]))
            english = (ball[1] - paddle_y) / self.paddle_halfheight * 0.01
            bvel = bvel.at[1].set(jnp.where(hit, bvel[1] + english, bvel[1]))
            ball = ball.at[0].set(jnp.where(hit, plane, ball[0]))
            return ball, bvel, hit

        ball, bvel, _ = paddle_bounce(ball, bvel, player_y, at_left=True)
        ball, bvel, _ = paddle_bounce(ball, bvel, cpu_y, at_left=False)

        player_point = ball[0] > 1.0  # past the cpu paddle
        cpu_point = ball[0] < 0.0  # past the agent paddle
        scored = player_point | cpu_point
        serve_ball, serve_vel = self._serve(key, toward_player=player_point)
        ball = jnp.where(scored, serve_ball, ball)
        bvel = jnp.where(scored, serve_vel, bvel)

        player_score = state.player_score + player_point.astype(jnp.int32)
        cpu_score = state.cpu_score + cpu_point.astype(jnp.int32)
        done = (player_score >= self.max_score) | (cpu_score >= self.max_score)

        reward = jnp.where(player_point, 1.0, 0.0) + jnp.where(cpu_point, -1.0, 0.0)
        t = state.t + 1
        new_state = PongState(
            player_y=player_y, player_vel=vel, cpu_y=cpu_y,
            ball=ball, ball_vel=bvel,
            player_score=player_score, cpu_score=cpu_score, t=t,
        )
        result = ActionResult(
            observation=self._obs(new_state),
            reward=_f32(reward),
            terminated=done,
            truncated=t >= self.max_steps,
        )
        return new_state, result
