"""O(1) circular frame-stacking for the visual (Atari) pipeline.

`StackingHistorySummarization` maintains its window with a T-frame shift
(`jnp.concatenate([carry[:, 1:], entry])`) — T frame copies per env step plus
whole-window zeroing on reset. At Atari scale (84x84 frames, thousands of
envs) those copies are the dominant HBM traffic of the fused actor-learner
step (docs/PARITY.md round-4 roofline). This module replaces them with:

- a circular (B, T, F) frame ring written with ONE dynamic-slice slab per
  step (all envs step in lockstep, so the write cursor is a single scalar);
- a (B, T) validity mask instead of zeroing frames on reset — episode
  boundaries cost a tiny boolean update, never a frame write;
- consumers that read the ring IN RING ORDER: `CNNQValueNetwork` rotates its
  first conv kernel's input channels by the cursor (mathematically exact —
  convolution over channel-permuted input equals convolution with the
  inverse-permuted kernel) and masks invalid frames as it reads, so the
  time-ordered window is NEVER materialized on the act path.

Semantics are exactly `StackingHistorySummarization(include_action=False)`:
the acting window holds the last T observations of the current episode,
zero-padded after reset (here: masked invalid). Bit-equality with the
shifting implementation is tested (tests/test_frame_ring.py).

Pairing contract (validated by `PearlAgent`): this summarizer requires a
replay buffer with frame-granular pushes (`VisualReplayBuffer`) and a
network that understands `FrameRingView` (`CNNQValueNetwork` with
`time_major_stack=True`). The generic replay path would need the
materialized window per step, which is precisely the traffic this module
exists to eliminate.

Reference anchor: the stacking summarizer this accelerates is
pearl/history_summarization_modules/stacking_history_summarization_module.py;
the reference's Atari preprocessing builds the same 4-frame windows
(pearl/utils/scripts/benchmark_config.py:1679-1747).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.history_summarization_modules.modules import (
    HistorySummarizationModule,
)


@struct.dataclass
class FrameRingView:
    """Circular frame window: both the per-env carry of
    `FrameRingHistorySummarization` AND the subjective-state view consumed by
    ring-aware networks.

    ring:   (B, T, F) frames in RING order; slot `(cursor - 1) % T` is newest.
    valid:  (B, T) slot belongs to the current episode (invalid slots read as
            zero frames, matching the stacking summarizer's zero padding).
    cursor: scalar i32 next write slot, shared by all envs (lockstep steps).
    """

    ring: jnp.ndarray
    valid: jnp.ndarray
    cursor: jnp.ndarray
    # Static provenance marker: True for views wrapped from replay-sampled
    # windows (the learn path, which differentiates through q_all and so
    # must use the autodiff-capable XLA conv), False for the live acting
    # carry (no-grad: eligible for the Pallas ring-conv fast path,
    # ops/ring_conv.py).
    from_replay: bool = struct.field(pytree_node=False, default=False)
    # Optional incremental-conv1 contribution cache (B, T, D), maintained by
    # PearlAgent when the paired CNN enables conv1_cache (ops/conv_cache.py).
    # None when the direct window conv is in use.
    cache: Optional[jnp.ndarray] = None

    @property
    def shape(self):
        # Present as the (B, stored_dim) array the generic act paths expect
        # (`B = subjective_state.shape[0]` everywhere).
        B, T, F = self.ring.shape
        return (B, T * F)

    @property
    def dtype(self):
        return self.ring.dtype

    def astype(self, dt):
        return self.replace(ring=self.ring.astype(dt))

    def materialize(self) -> jnp.ndarray:
        """Time-ordered, zero-masked (B, T*F) window — bit-compatible with
        `StackingHistorySummarization(include_action=False).stored`. O(T)
        frame traffic; reference/testing path, never the hot act path."""
        B, T, F = self.ring.shape
        order = (self.cursor + jnp.arange(T)) % T  # oldest ... newest
        frames = jnp.take(self.ring, order, axis=1)
        mask = jnp.take(self.valid, order, axis=1)
        out = frames * mask[..., None].astype(frames.dtype)
        return out.reshape(B, T * F)


@dataclasses.dataclass(frozen=True)
class FrameRingHistorySummarization(HistorySummarizationModule):
    """Drop-in for `StackingHistorySummarization(include_action=False)` on
    the visual fast path (see module docstring)."""

    history_length: int = 4
    # Ring storage dtype (e.g. jnp.bfloat16 halves window traffic; the CNN
    # act path consumes bf16 natively). None keeps float32.
    dtype: Optional[object] = None

    @property
    def is_frame_ring(self) -> bool:
        return True

    def _dt(self):
        return self.dtype or jnp.float32

    def init_carry(self, num_envs, obs_dim, action_repr_dim):
        T = self.history_length
        return FrameRingView(
            ring=jnp.zeros((num_envs, T, obs_dim), self._dt()),
            valid=jnp.zeros((num_envs, T), bool),
            cursor=jnp.zeros((), jnp.int32),
        )

    def observe(self, carry: FrameRingView, obs, action_repr) -> FrameRingView:
        del action_repr  # observations-only window (include_action=False)
        c = carry.cursor
        ring = jax.lax.dynamic_update_slice_in_dim(
            carry.ring, obs[:, None, :].astype(carry.ring.dtype), c, axis=1
        )
        valid = jax.lax.dynamic_update_slice_in_dim(
            carry.valid, jnp.ones((obs.shape[0], 1), bool), c, axis=1
        )
        return FrameRingView(
            ring=ring, valid=valid, cursor=(c + 1) % self.history_length
        )

    def advance(
        self, carry: FrameRingView, obs, reset_obs, done
    ) -> FrameRingView:
        """Fused post-step update (the agent fast path): one frame write.

        Non-done envs append `obs` (the step's observation); done envs
        restart their window with `reset_obs` (auto-reset observation) as the
        only valid slot — exactly the stacking summarizer's
        observe -> zero-window -> observe(reset) sequence, without touching
        the other T-1 slots."""
        c = carry.cursor
        from pearl_tpu.ops.ring_write import use_ring_write

        if use_ring_write() and jax.default_backend() == "tpu":
            # In-place Pallas slab write: XLA fuses the plain DUS below
            # into a full-carry rewrite (0.37 ms/step at bench shape, not
            # layout-fixable — ops/ring_write.py); the aliased kernel moves
            # only the one-frame slab. The entry is BUILT transposed
            # (F, B) — observations are stored column-major, so the
            # where-fusion is one aligned pass emitting exactly the
            # kernel's operand layout. (Fusing the where INTO the kernel —
            # ring_slab_write_where_tfb — measured 803k vs 825k
            # env-steps/s at the bench shape: its block-serial DMA chain
            # costs more than the fusion it saves. Kept for the record.)
            from pearl_tpu.ops.ring_write import ring_slab_write_tfb  # noqa: PLC0415

            entry_fb = jnp.where(
                done[None, :], reset_obs.T, obs.T
            ).astype(carry.ring.dtype)
            ring_tfb = ring_slab_write_tfb(
                jnp.transpose(carry.ring, (1, 2, 0)), entry_fb, c
            )
            ring = jnp.transpose(ring_tfb, (2, 0, 1))
        else:
            entry = jnp.where(done[:, None], reset_obs, obs)
            ring = jax.lax.dynamic_update_slice_in_dim(
                carry.ring, entry[:, None, :].astype(carry.ring.dtype), c, axis=1
            )
        valid = jnp.where(done[:, None], jnp.zeros_like(carry.valid), carry.valid)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones((obs.shape[0], 1), bool), c, axis=1
        )
        return FrameRingView(
            ring=ring, valid=valid, cursor=(c + 1) % self.history_length
        )

    def newest_frame(self, carry: FrameRingView) -> jnp.ndarray:
        """The most recently written frame — the observation the agent is
        acting on (slot (cursor-1) % T)."""
        c = (carry.cursor - 1) % self.history_length
        return jax.lax.dynamic_slice_in_dim(carry.ring, c, 1, axis=1)[:, 0]

    def reset_envs(self, carry: FrameRingView, done_mask) -> FrameRingView:
        # Frames stay in place; invalidating the mask is the reset.
        return carry.replace(
            valid=jnp.where(done_mask[:, None], jnp.zeros_like(carry.valid), carry.valid)
        )

    def stored(self, carry: FrameRingView) -> FrameRingView:
        # The carry IS the stored view; consumers that need the time-ordered
        # window call .materialize(). The agent's frame fast path never does.
        return carry

    def forward(self, params, stored):
        if isinstance(stored, FrameRingView):
            return stored
        # Replay-sampled windows arrive as time-ordered (B, T*F) arrays with
        # zeros already in place: present them as a cursor-0 (roll = identity)
        # all-valid ring so networks handle ONE input type.
        B = stored.shape[0]
        T = self.history_length
        return FrameRingView(
            ring=stored.reshape(B, T, -1),
            valid=jnp.ones((B, T), bool),
            cursor=jnp.zeros((), jnp.int32),
            from_replay=True,
        )

    def subjective_dim(self, obs_dim, action_repr_dim):
        return self.history_length * obs_dim

    def stored_dim(self, obs_dim, action_repr_dim):
        return self.history_length * obs_dim
