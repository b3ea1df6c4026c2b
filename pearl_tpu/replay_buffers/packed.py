"""Packed-storage replay: the whole transition in ONE contiguous ring write.

`BasicReplayBuffer` stores the transition pytree as one device array per
field, so every push is ~8 separate `dynamic_update_slice` writes (one per
leaf). The no-learn ablation (docs/DESIGN.md §4) pins ~110 us of the 268 us
fused scan step on this observe/push path at the bench config. This variant
flattens every field to float32 and concatenates them into a single
(capacity, F) ring so a push is exactly ONE `dynamic_update_slice` and a
sample is ONE row gather (then split/cast back per field).

Semantics are identical to `BasicReplayBuffer` (bump-ring write, uniform
with-replacement sampling, high-water `size`); dtype round-trips are exact:
bool -> {0.0, 1.0} -> bool, int32 -> f32 -> int32 (exact for |v| < 2^24 —
action indices and bootstrap masks are tiny). Opt-in: measured against the
per-field layout in docs/PARITY.md before any default flips.

Reference anchor: pearl/replay_buffers/tensor_based_replay_buffer.py:254-403
(the per-sample torch.cat batch assembly this whole layer replaces).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@dataclasses.dataclass(frozen=True)
class PackedReplayBuffer(BasicReplayBuffer):
    """Uniform FIFO replay over a single packed (capacity, F) f32 ring.

    `ReplayBufferState.storage` holds `{"packed": (capacity, F) f32,
    "template": pytree}` where the template is the example TransitionBatch
    with a zero-length batch axis — it carries each field's trailing shape
    and dtype so `sample` can split and cast the gathered rows back.
    """

    def init(self, example: TransitionBatch) -> ReplayBufferState:
        if self.bf16_storage:
            raise ValueError(
                "PackedReplayBuffer stores every field through one float32 "
                "ring; bf16_storage is not supported (use BasicReplayBuffer "
                "for bf16 per-field storage)."
            )
        for leaf in jax.tree.leaves(example):
            # All fields round-trip through float32: integers are exact only
            # within +/-2^24 (plenty for action indices / bootstrap masks),
            # but 64-bit fields would corrupt silently — fail loudly.
            if jnp.issubdtype(leaf.dtype, jnp.integer) and leaf.dtype.itemsize > 4:
                raise ValueError(
                    f"PackedReplayBuffer cannot store {leaf.dtype} fields "
                    "exactly through its float32 ring; use BasicReplayBuffer."
                )
        template = jax.tree.map(
            lambda x: jnp.zeros((0,) + tuple(x.shape[1:]), x.dtype), example
        )
        feat = sum(math.prod(x.shape[1:]) for x in jax.tree.leaves(example))
        return ReplayBufferState(
            storage={
                "packed": jnp.zeros((self.capacity, feat), jnp.float32),
                "template": template,
            },
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def _pack(batch: TransitionBatch) -> jnp.ndarray:
        n = batch.reward.shape[0]
        rows = [
            v.reshape(n, -1).astype(jnp.float32) for v in jax.tree.leaves(batch)
        ]
        return jnp.concatenate(rows, axis=-1)

    def push(
        self,
        state: ReplayBufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> ReplayBufferState:
        del key
        n = batch.reward.shape[0]
        self._warn_if_capacity_misaligned(n)
        start = jnp.where(state.cursor + n <= self.capacity, state.cursor, 0)
        packed = jax.lax.dynamic_update_slice_in_dim(
            state.storage["packed"], self._pack(batch), start, axis=0
        )
        return ReplayBufferState(
            storage={"packed": packed, "template": state.storage["template"]},
            cursor=(start + n) % self.capacity,
            size=jnp.maximum(state.size, start + n),
        )

    def sample(
        self, state: ReplayBufferState, key: PRNGKey, batch_size: int
    ) -> TransitionBatch:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
        rows = state.storage["packed"][idx]  # (B, F)
        template = state.storage["template"]
        leaves, treedef = jax.tree.flatten(template)
        out, offset = [], 0
        for t in leaves:
            width = math.prod(t.shape[1:])
            chunk = rows[:, offset : offset + width]
            offset += width
            chunk = chunk.reshape((batch_size,) + tuple(t.shape[1:]))
            if t.dtype == jnp.bool_:
                chunk = chunk != 0.0
            else:
                chunk = chunk.astype(t.dtype)
            out.append(chunk)
        return jax.tree.unflatten(treedef, out)
