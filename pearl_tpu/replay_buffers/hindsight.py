"""Hindsight experience replay (reference:
pearl/replay_buffers/sequential_decision_making/hindsight_experience_replay_buffer.py:20-155).

Normal transitions are pushed to the ring immediately AND cached per env; when
an env's episode ends, its cached trajectory is re-pushed with the goal
replaced by the finally-achieved state and reward/terminated recomputed by
`reward_fn` (final-goal relabeling strategy, Andrychowicz et al. 2017).

Under jit the flush is shape-static: every step writes all (num_envs *
max_episode_len) relabeled rows, mapping rows of non-done envs (and unused
slots) to an out-of-bounds index that `.at[].set(mode="drop")` discards — no
ragged shapes, no host callbacks.

Observation layout contract (same as the reference's sparse env): the stored
state vector ends with the `goal_dim` goal features, and the achieved-state
features used for relabeling are the first `goal_dim` features.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class HERBufferState(ReplayBufferState):
    trajectory: TransitionBatch = None  # (num_envs, L, ...)
    lengths: jnp.ndarray = None  # (num_envs,)


def default_reach_reward_fn(achieved, goal, reward_distance=4.0):
    """Sparse reach reward (matches DiscreteSparseRewardEnvironment)."""
    reached = jnp.linalg.norm(achieved - goal, axis=-1) < reward_distance
    return jnp.where(reached, 0.0, -1.0), reached


@dataclasses.dataclass(frozen=True, eq=False)
class HindsightExperienceReplayBuffer(BasicReplayBuffer):
    num_envs: int = 1
    max_episode_len: int = 50
    goal_dim: int = 2
    reward_fn: Callable = default_reach_reward_fn

    def init(self, example: TransitionBatch) -> HERBufferState:
        base = super().init(example)
        traj = jax.tree.map(
            lambda x: jnp.zeros(
                (self.num_envs, self.max_episode_len) + tuple(x.shape[1:]), x.dtype
            ),
            example,
        )
        return HERBufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            trajectory=traj,
            lengths=jnp.zeros((self.num_envs,), jnp.int32),
        )

    def _relabel(self, traj: TransitionBatch, new_goal: jnp.ndarray) -> TransitionBatch:
        """traj leaves (L, ...) for one env; new_goal (goal_dim,)."""
        g = self.goal_dim

        def swap_goal(s):
            return jnp.concatenate([s[..., :-g], jnp.broadcast_to(new_goal, s.shape[:-1] + (g,))], axis=-1)

        state = swap_goal(traj.state)
        next_state = swap_goal(traj.next_state)
        achieved_next = traj.next_state[..., :g]
        reward, terminated = self.reward_fn(achieved_next, new_goal)
        return traj.replace(
            state=state,
            next_state=next_state,
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros_like(traj.truncated),
        )

    @property
    def supports_deferred_push(self) -> bool:
        return False  # per-env trajectory cache pairs rows stepwise

    def push(
        self,
        state: HERBufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> HERBufferState:
        del key
        B, L = self.num_envs, self.max_episode_len
        # 1. Normal push of the raw transitions.
        base = super().push(
            ReplayBufferState(storage=state.storage, cursor=state.cursor, size=state.size),
            batch,
        )
        # 2. Append to per-env trajectory caches (clamped; episodes longer than
        #    L keep only the first L steps for relabeling).
        slot = jnp.minimum(state.lengths, L - 1)
        traj = jax.tree.map(
            lambda cache, val: cache.at[jnp.arange(B), slot].set(val),
            state.trajectory,
            batch,
        )
        lengths = jnp.minimum(state.lengths + 1, L)

        # 3. For done envs, relabel with the finally-achieved state and flush.
        done = batch.done  # (B,)
        achieved_final = batch.next_state[:, : self.goal_dim]  # (B, g)
        relabeled = jax.vmap(self._relabel)(traj, achieved_final)  # (B, L, ...)

        # Row-validity: env done AND slot index < its episode length.
        slot_ids = jnp.arange(L)[None, :]  # (1, L)
        valid = done[:, None] & (slot_ids < lengths[:, None])  # (B, L)
        n_flush = jnp.sum(valid.astype(jnp.int32))
        # Target ring indices in flush order; invalid rows -> OOB (dropped).
        order = jnp.cumsum(valid.reshape(-1)) - 1  # position among valid rows
        target = (base.cursor + order) % self.capacity
        target = jnp.where(valid.reshape(-1), target, self.capacity)  # OOB drop

        storage = jax.tree.map(
            lambda buf, rows: buf.at[target].set(
                rows.reshape((B * L,) + rows.shape[2:]), mode="drop"
            ),
            base.storage,
            relabeled,
        )
        lengths = jnp.where(done, 0, lengths)
        return HERBufferState(
            storage=storage,
            cursor=(base.cursor + n_flush) % self.capacity,
            size=jnp.minimum(base.size + n_flush, self.capacity),
            trajectory=traj,
            lengths=lengths,
        )
