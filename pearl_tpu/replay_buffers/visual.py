"""Frame-dedup replay for visual (frame-stacked) observations.

The classic production-DQN Atari optimization, TPU-native: a transition whose
state/next_state are T-frame stacks stores T+1 frames of which T-1 are
duplicated from the previous step. `BasicReplayBuffer` writes both full
stacks (2*T frames/row); this buffer stores TWO frames per row — the acting
observation `s` (the stack's newest frame) and the post-step observation `n`
— plus a monotone push-sequence tag, and reconstructs both stacks at SAMPLE
time from the B-strided neighbor rows (push order: one row per env per step,
so env e's previous step lives exactly `num_envs` rows back). For T=4 this
cuts ring storage and push traffic 4x (8 frames -> 2).

`dedup_next=True` goes to ONE frame per row: `n` of row i duplicates `s` of
row i+num_envs within an episode, so the next-stack's newest frame is read
from the successor row instead of stored (the newest resident push, whose
successor hasn't been written yet, is excluded from sampling — symmetric to
the oldest-(T-1) post-wrap exclusion). Episode-final rows have no successor
within the episode; their final frames are covered by a TRUNCATION SIDE
RING `frame_t`: pushes containing a truncated row write the (masked)
post-step frames into the side slab under a `lax.cond`, so the write fires
only on those pushes (~1/episode_len when truncations are time-limit
lockstep, as in the Atari protocol) and stale side data is never read (a
row's side slab is consulted only when that row itself is truncated, and a
truncated resident row always wrote its slab). This makes dedup_next exact
for every row the TD target can see: non-final rows and truncated rows
reconstruct bit-exactly; TERMINATED rows read a zero newest next-frame,
which is invisible — the Bellman target multiplies next values by
(1 - terminated) (reference deep_td_learning.py:313-318), matching
deep_td.py here.

Stack reconstruction matches `StackingHistorySummarization(include_action=
False)` EXACTLY (bit-equal batches are tested): frames older than the
current episode are zeros (the summarizer zero-pads after reset), enforced
by a done-chain mask; the sequence tag kills frames lost to ring wrap,
overwrite, or underfill. Sampling is gathers over (T+1) rows — O(T) HBM
reads of single frames, no scatter.

`push_frames` is the fast-path entry used by `PearlAgent` when paired with
`FrameRingHistorySummarization`: the agent hands over the two single frames
directly, so the stacked windows are never materialized on the push path.

Reference anchor: pearl/replay_buffers/tensor_based_replay_buffer.py stores
full stacked tensors per transition (no dedup exists in the reference);
the reference's Atari preprocessing builds the same 4-frame windows
(benchmark_config.py:1679-1747).

Constraints (checked): capacity % num_envs == 0; capacity >= stack*num_envs;
every push must be exactly num_envs rows (one vectorized env step) — drivers
do this by construction; pair with StackingHistorySummarization(
include_action=False) or FrameRingHistorySummarization, and CNN nets'
`time_major_stack=True`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer, ReplayBufferState
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class VisualBufferState(ReplayBufferState):
    # storage: dict with "frame_s" (capacity, F) frame ring ("frame_n" too
    # unless dedup_next), "seq" (cap_pushes,) i32 per-push sequence tag,
    # "rest" (TransitionBatch with state/next_state=None, (capacity, ...)
    # rows) for the non-visual fields. Flat (capacity, F) rows with a
    # contiguous row-block write per push: the (cap_pushes, B, F) slab
    # variant was measured 4x slower end-to-end on chip (XLA layout
    # assignment; round-4 ladder in docs/PARITY.md).
    push_count: jnp.ndarray = None  # i32 total pushes so far


@dataclasses.dataclass(frozen=True)
class VisualReplayBuffer(BasicReplayBuffer):
    stack: int = 4  # frames per stacked state (summarizer history_length)
    num_envs: int = 1  # rows per push == env-step batch (the frame stride)
    # Optional storage dtype for the frame rings only (e.g. jnp.bfloat16 to
    # halve frame traffic; uint8 for 0-255-valued observations). Frames are
    # cast back to the original dtype on sample. None = keep dtype.
    frame_dtype: Optional[object] = None
    # 1-frame/row mode: drop the frame_n ring and read next-stack newest
    # frames from the successor row; truncated rows' final frames come from
    # the cond-written `frame_t` side ring (see module docstring).
    dedup_next: bool = False

    @property
    def min_pushes_before_sample(self) -> int:
        """Resident pushes required before sample() is meaningful: the
        newest resident push is excluded under dedup_next (its successor
        rows don't exist yet), so at least one more must be present.
        Drivers validate learning_starts against this (x num_envs)."""
        return 2 if self.dedup_next else 1

    @property
    def supports_deferred_push(self) -> bool:
        return False  # neighbor reconstruction needs one row per env per push

    @property
    def supports_frame_push(self) -> bool:
        return True  # push_frames: the FrameRing fast-path entry

    def _frame_size(self, stored_dim: int) -> int:
        if stored_dim % self.stack != 0:
            raise ValueError(
                f"state dim {stored_dim} is not stack={self.stack} frames; "
                "pair VisualReplayBuffer with StackingHistorySummarization("
                "include_action=False, history_length=stack)"
            )
        return stored_dim // self.stack

    def init(self, example: TransitionBatch) -> VisualBufferState:
        if self.capacity % self.num_envs != 0:
            raise ValueError(
                f"capacity {self.capacity} must be a multiple of "
                f"num_envs {self.num_envs}"
            )
        if self.capacity < self.stack * self.num_envs:
            # Post-wrap, sampling excludes the oldest (stack-1) resident
            # pushes (their backward neighbors are gone); with fewer than
            # `stack` pushes resident the exclusion would leave nothing and
            # sample() would silently alias a single ring slot.
            raise ValueError(
                f"capacity {self.capacity} must be >= stack*num_envs = "
                f"{self.stack * self.num_envs} (the ring must hold at least "
                "`stack` pushes for neighbor reconstruction)"
            )
        F = self._frame_size(example.state.shape[-1])
        fdt = self.frame_dtype or example.state.dtype
        rest = example.replace(state=None, next_state=None)
        rest_storage = jax.tree.map(
            lambda x: jnp.zeros((self.capacity,) + tuple(x.shape[1:]), x.dtype),
            rest,
        )
        cap_pushes = self.capacity // self.num_envs
        storage = {
            "frame_s": jnp.zeros((self.capacity, F), fdt),
            "seq": jnp.full((cap_pushes,), -(10**9), jnp.int32),
            "rest": rest_storage,
        }
        if not self.dedup_next:
            storage["frame_n"] = jnp.zeros((self.capacity, F), fdt)
        else:
            # Truncation side ring: episode-final frames of truncated rows,
            # written only on pushes that contain a truncation (lax.cond).
            storage["frame_t"] = jnp.zeros((self.capacity, F), fdt)
        return VisualBufferState(
            storage=storage,
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            push_count=jnp.zeros((), jnp.int32),
        )

    def push_frames(
        self,
        state: VisualBufferState,
        frame_s: jnp.ndarray,
        frame_n: Optional[jnp.ndarray],
        rest: TransitionBatch,
        key: Optional[PRNGKey] = None,
        *,
        frame_n_fb: Optional[jnp.ndarray] = None,
    ) -> VisualBufferState:
        """One vectorized env step as single frames: `frame_s` (B, F) is the
        acting observation (the state stack's newest frame), `frame_n` the
        post-step observation. `rest` carries every non-visual field
        (state/next_state must be None).

        `frame_n_fb` is the (F, B) transposed alternative to `frame_n`
        (dedup_next fast path): the side-ring write transposes it INSIDE its
        lax.cond branch, so the (B, F) form of the observation is never
        materialized on pushes without a truncation — observations are
        stored column-major and keeping one form saves a full frame write
        per step (round-5 profile, ops/ring_write.py)."""
        del key
        n = frame_s.shape[0]
        if n != self.num_envs:
            raise ValueError(
                f"VisualReplayBuffer pushes must be exactly num_envs="
                f"{self.num_envs} rows (got {n}): one row per env per step"
            )
        cap_pushes = self.capacity // self.num_envs
        slot = state.push_count % cap_pushes
        start = slot * n

        def write_rows(buf, v):
            return jax.lax.dynamic_update_slice_in_dim(
                buf, v.astype(buf.dtype), start, axis=0
            )

        storage = {
            "frame_s": write_rows(state.storage["frame_s"], frame_s),
            "seq": jax.lax.dynamic_update_slice_in_dim(
                state.storage["seq"],
                jnp.full((1,), state.push_count, jnp.int32),
                slot,
                axis=0,
            ),
            "rest": jax.tree.map(
                write_rows,
                state.storage["rest"],
                rest.replace(state=None, next_state=None),
            ),
        }
        if not self.dedup_next:
            if frame_n is None:
                frame_n = frame_n_fb.T
            storage["frame_n"] = write_rows(state.storage["frame_n"], frame_n)
        else:
            if frame_n is None and frame_n_fb is None:
                raise ValueError(
                    "dedup_next requires the post-step frame at push time "
                    "(truncated rows' final frames go to the side ring)"
                )
            trunc = rest.truncated

            def _write_side(buf):
                fn = frame_n if frame_n is not None else frame_n_fb.T
                slab = jnp.where(trunc[:, None], fn.astype(buf.dtype), 0)
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, slab, start, axis=0
                )

            # cond, not where: the slab write is skipped ENTIRELY on pushes
            # with no truncation (time-limit lockstep envs truncate on
            # 1/episode_len of pushes). Stale slab data is never read —
            # sample() consults frame_t[i] only when row i itself is
            # truncated, and a truncated resident row always wrote its slab.
            storage["frame_t"] = jax.lax.cond(
                jnp.any(trunc),
                _write_side,
                lambda buf: buf,
                state.storage["frame_t"],
            )
        return VisualBufferState(
            storage=storage,
            cursor=(start + n) % self.capacity,
            size=jnp.maximum(state.size, start + n),
            push_count=state.push_count + 1,
        )

    def push(
        self,
        state: VisualBufferState,
        batch: TransitionBatch,
        key: Optional[PRNGKey] = None,
    ) -> VisualBufferState:
        F = self._frame_size(batch.state.shape[-1])
        return self.push_frames(
            state,
            batch.state[:, -F:],
            batch.next_state[:, -F:],
            batch,
            key,
        )

    def sample(
        self, state: VisualBufferState, key: PRNGKey, batch_size: int
    ) -> TransitionBatch:
        st = state.storage
        B, T = self.num_envs, self.stack
        # After the ring wraps, the rows just ahead of the cursor (the oldest
        # resident pushes) have lost their backward neighbors to newer data —
        # reconstruction there would zero real mid-episode frames. Exclude
        # the oldest (stack-1) resident pushes from sampling (a (T-1)*B-row
        # haircut on effective capacity); before any wrap the mapping below
        # is the IDENTITY on row indices, so sampling is bit-identical to
        # BasicReplayBuffer at the same key (tested). With dedup_next the
        # NEWEST resident push is excluded too (its successor rows — the
        # source of its next-stack frames — don't exist yet).
        cap_pushes = self.capacity // self.num_envs
        pc = state.push_count
        oldest_valid = jnp.where(pc <= cap_pushes, 0, pc - cap_pushes + (T - 1))
        newest_excl = 1 if self.dedup_next else 0
        n_valid = jnp.maximum(pc - newest_excl - oldest_valid, 1) * B
        q = jax.random.randint(key, (batch_size,), 0, n_valid)
        push = oldest_valid + q // B
        slot = push % cap_pushes  # frame-ring slab
        env = q % B
        idx = slot * B + env  # flat row into "rest"
        rest = jax.tree.map(lambda buf: buf[idx], st["rest"])
        dtype = jnp.promote_types(st["frame_s"].dtype, jnp.float32)

        seq_i = st["seq"][slot]
        s_i = st["frame_s"][idx].astype(dtype)
        done = rest.terminated | rest.truncated
        if self.dedup_next:
            # Next-stack newest frame: successor slab (same env, next push)
            # for mid-episode rows; the truncation side ring for truncated
            # rows (exact bootstrap); zero for terminated rows (invisible —
            # TD targets multiply next values by (1 - terminated)).
            slot2 = (slot + 1) % cap_pushes
            succ_ok = (st["seq"][slot2] == seq_i + 1) & ~done
            n_i = jnp.where(
                succ_ok[:, None],
                st["frame_s"][slot2 * B + env].astype(dtype),
                jnp.where(
                    rest.truncated[:, None],
                    st["frame_t"][idx].astype(dtype),
                    0.0,
                ),
            )
        else:
            n_i = st["frame_n"][idx].astype(dtype)

        # Older frames: env e's step k-back lives in the slab k pushes back.
        # A neighbor contributes iff (a) its sequence tag is exactly k less
        # (kills wrap/overwrite/underfill) and (b) no episode boundary in
        # between (the summarizer zero-pads after reset) — the done chain.
        frames = [s_i]  # state stack, newest last (reversed at the end)
        valid = jnp.ones((batch_size,), bool)
        for k in range(1, T):
            slot_k = (slot - k) % cap_pushes
            jdx = slot_k * B + env
            prev_done = st["rest"].terminated[jdx] | st["rest"].truncated[jdx]
            valid = valid & (st["seq"][slot_k] == seq_i - k) & ~prev_done
            frames.append(
                jnp.where(valid[:, None], st["frame_s"][jdx].astype(dtype), 0.0)
            )
        # state = [oldest ... newest=s_i]; next_state drops the oldest and
        # appends n_i.
        state_stack = jnp.concatenate(frames[::-1], axis=-1)
        next_stack = jnp.concatenate(frames[-2::-1] + [n_i], axis=-1)
        return rest.replace(state=state_stack, next_state=next_stack)

    def clear(self, state: VisualBufferState) -> VisualBufferState:
        base = super().clear(state)
        # Invalidate sequence tags so stale neighbors never match post-clear.
        return base.replace(
            storage={**state.storage, "seq": jnp.full_like(state.storage["seq"], -(10**9))},
            push_count=jnp.zeros((), jnp.int32),
        )
