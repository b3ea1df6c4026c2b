"""HBM-resident ring-buffer replay (reference: pearl/replay_buffers/*).

The reference keeps a CPU deque of per-step `Transition`s and re-concatenates
sampled Python lists into batches on every learner round
(tensor_based_replay_buffer.py:254-403) — the single biggest throughput
bottleneck identified in SURVEY.md §3.3. Here the buffer is a preallocated
pytree of device arrays (capacity-leading axis) + a cursor: `push` is a
scatter, `sample` is a gather, both O(1) jitted ops that fuse into the
surrounding training scan.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class ReplayBufferState:
    storage: TransitionBatch  # every leaf has leading axis = capacity
    cursor: jnp.ndarray  # i32 next write slot
    size: jnp.ndarray  # i32 number of valid entries


@dataclasses.dataclass(frozen=True)
class BasicReplayBuffer:
    """Uniform FIFO replay (reference basic_replay_buffer.py:18-49).

    Sampling is uniform WITH replacement (`random.randint` gather) — the
    reference samples without replacement via `random.sample`, a distinction
    that is immaterial for capacity >> batch_size and avoids a device-side
    permutation.
    """

    capacity: int = 10_000
    # Store float leaves in bfloat16 to halve the HBM footprint and push/
    # sample bandwidth; batches are converted back to float32 on sample.
    # Observations/rewards at bf16 precision are ample for RL replay.
    bf16_storage: bool = False

    # Whether a driver may collect a whole chunk's transitions (k steps x B
    # envs, step-major) and write them in ONE push instead of k per-step
    # pushes. True when push is stateless in row order (ring write + cursor
    # bump); overridden False by buffers whose push pairs rows with per-env
    # caches (SARSA's next-action delay, HER's trajectory cache).
    @property
    def supports_deferred_push(self) -> bool:
        return True

    def _warn_if_capacity_misaligned(self, push_size: int) -> None:
        """Shared bump-ring misalignment warning (used by every push
        implementation so the message stays in sync across layouts)."""
        if self.capacity % push_size != 0:
            import warnings

            warnings.warn(
                f"Replay capacity {self.capacity} is not a multiple of the "
                f"push batch size {push_size}: the bump-ring write restarts "
                f"at slot 0 when a batch would not fit, so the last "
                f"capacity % n = {self.capacity % push_size} slots are never "
                f"written or sampled. Use capacity = k * {push_size} for the "
                f"full capacity.",
                stacklevel=3,
            )

    def _store_dtype(self, dtype):
        if self.bf16_storage and dtype == jnp.float32:
            return jnp.bfloat16
        return dtype

    def init(self, example: TransitionBatch) -> ReplayBufferState:
        """`example` is a TransitionBatch with any leading axis (its values are
        only used for shape/dtype)."""
        storage = jax.tree.map(
            lambda x: jnp.zeros(
                (self.capacity,) + tuple(x.shape[1:]), self._store_dtype(x.dtype)
            ),
            example,
        )
        return ReplayBufferState(
            storage=storage,
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def push(
        self, state: ReplayBufferState, batch: TransitionBatch, key: Optional[PRNGKey] = None
    ) -> ReplayBufferState:
        """Write a batch of transitions (leading axis = N) at the cursor.

        Bump-ring design: the batch is always written as ONE contiguous
        `dynamic_update_slice` — on TPU a vectorized copy, vs a general
        scatter which the XLA TPU backend serializes row-by-row (the original
        6M->32M steps/s bottleneck). If the batch would not fit before the
        ring end, the write restarts at slot 0 instead of wrapping mid-batch
        (a scalar `where`, no `lax.cond`, no scatter — profiling showed the
        cond alone cost ~28% of the fused step). Whenever `capacity % N == 0`
        — every production config — this is bit-identical to a classic ring.
        With non-dividing sizes the effective capacity rounds down to the
        last batch that fits; `size` is therefore a high-water mark of the
        written extent, so never-written tail slots are never sampled.
        """
        del key
        n = batch.reward.shape[0]
        self._warn_if_capacity_misaligned(n)
        start = jnp.where(state.cursor + n <= self.capacity, state.cursor, 0)
        storage = jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
                buf, v.astype(buf.dtype), start, axis=0
            ),
            state.storage,
            batch,
        )
        return ReplayBufferState(
            storage=storage,
            cursor=(start + n) % self.capacity,
            size=jnp.maximum(state.size, start + n),
        )

    def sample(
        self, state: ReplayBufferState, key: PRNGKey, batch_size: int
    ) -> TransitionBatch:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
        return jax.tree.map(
            lambda buf: (
                buf[idx].astype(jnp.float32)
                if buf.dtype == jnp.bfloat16
                else buf[idx]
            ),
            state.storage,
        )

    def clear(self, state: ReplayBufferState) -> ReplayBufferState:
        # `replace` keeps subclass state fields (pending caches, priorities,
        # trajectory caches) intact.
        return state.replace(
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def __len__(self) -> int:
        return self.capacity


@dataclasses.dataclass(frozen=True)
class SingleTransitionReplayBuffer(BasicReplayBuffer):
    """1-slot buffer used as the default for tabular/bandit learners
    (reference examples/single_transition_replay_buffer.py:43-94)."""

    capacity: int = 1

    @property
    def supports_deferred_push(self) -> bool:
        return False  # a k*B-row write cannot fit the 1-slot ring
