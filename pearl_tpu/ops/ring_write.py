"""In-place frame-ring slab write (Pallas, aliased DMA).

The frame-ring carry's per-step update writes ONE (B, F) frame into slot
`cursor` of the (B, T, F) ring. XLA:TPU fuses that dynamic-update-slice with
the env-observation producer into a multi-output fusion that REWRITES THE
WHOLE CARRY every step — 0.37 ms/step at the bench shape vs ~0.02 ms for the
slab alone (round-4/5 profiles, docs/PARITY.md). The rewrite is not
layout-fixable: it survives severing every conv consumer (measured, round
5). This kernel forces the in-place contract instead: a `pallas_call` whose
output ALIASES the ring operand (`input_output_aliases`) and whose body DMAs
only the slab, so the other T-1 slots are never touched.

Layout note: the kernel sees the ring as its (T, F, B) transposed view.
XLA:TPU lays the (B, T, F) bf16 carry out as {0,2,1} (minor-to-major
b, F, t) because row-major would sublane-pad T=4 -> 16, quadrupling HBM
footprint and traffic; the (T, F, B) logical view of that layout IS
row-major, so the transposes bracketing this call are bitcasts, and the
pallas operand contract (default descending layout) matches the carry's
physical bytes with zero relayout. The entry arrives as its (F, B)
transposed view for the same reason (the env observation is laid out
column-major by the same padding rule).

Reference anchor: the stacking summarizer this accelerates is
pearl/history_summarization_modules/stacking_history_summarization_module.py;
its TPU-native redesign is history_summarization_modules/frame_ring.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_ring_write() -> bool:
    """Default ON, chosen by measurement: visual bench 736k -> 791k
    env-steps/s standalone, 827k with the push fence (20-call windows,
    round-5 ladder in docs/PARITY.md). PEARL_TPU_RING_WRITE=0 restores the
    plain XLA DUS; TPU callers additionally gate on backend == "tpu"."""
    return os.environ.get("PEARL_TPU_RING_WRITE", "1") == "1"


def _kernel(cursor_ref, entry_ref, ring_ref, out_ref, sem):
    # out_ref aliases ring_ref: only the cursor slab moves.
    del ring_ref
    c = cursor_ref[0]
    dma = pltpu.make_async_copy(entry_ref, out_ref.at[c], sem)
    dma.start()
    dma.wait()


def _where_kernel(cursor_ref, done_ref, obs_ref, reset_ref, ring_ref,
                  out_ref, scratch, sem):
    # Fused auto-reset select + in-place slab write: done envs restart
    # their window with the reset observation. Doing the where HERE keeps
    # the observation in ONE materialized form — an XLA where-fusion ahead
    # of the aliased call forced a second full-frame output per step
    # (0.37 ms, round-5 profile).
    del ring_ref
    c = cursor_ref[0]
    d = done_ref[:] > 0.5  # (1, B) f32 -> bool
    scratch[:] = jnp.where(d, reset_ref[:], obs_ref[:]).astype(scratch.dtype)
    f0 = pl.program_id(0) * scratch.shape[0]
    dma = pltpu.make_async_copy(
        scratch, out_ref.at[c, pl.ds(f0, scratch.shape[0]), :], sem
    )
    dma.start()
    dma.wait()


@jax.jit
def ring_slab_write_where_tfb(ring_tfb, obs_fb, reset_fb, done, cursor):
    """ring_tfb[cursor] <- where(done, reset_fb, obs_fb), in place.

    obs_fb/reset_fb: (F, B) views of the step/reset observations (their
    natural column-major storage — see module docstring); done: (B,) bool.
    """
    T, F, B = ring_tfb.shape
    fb = next(r for r in (1008, 882, 504, 336, 144, 48, 16, 8, 4, 2, 1) if F % r == 0)
    return pl.pallas_call(
        _where_kernel,
        grid=(F // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T, F, B), ring_tfb.dtype),
        scratch_shapes=[
            pltpu.VMEM((fb, B), ring_tfb.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={4: 0},
    )(
        jnp.reshape(cursor, (1,)).astype(jnp.int32),
        done.reshape(1, B).astype(jnp.float32),
        obs_fb,
        reset_fb,
        ring_tfb,
    )


@jax.jit
def ring_slab_write_tfb(ring_tfb, entry_fb, cursor):
    """ring_tfb[cursor] <- entry_fb, in place.

    ring_tfb: (T, F, B) view of the ring carry (see module docstring)
    entry_fb: (F, B) view of the new frame
    cursor:   scalar i32 slot
    """
    T, F, B = ring_tfb.shape
    return pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((T, F, B), ring_tfb.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        input_output_aliases={2: 0},
    )(jnp.reshape(cursor, (1,)).astype(jnp.int32), entry_fb, ring_tfb)


def ring_write(ring_btf, entry_bf, cursor):
    """(B, T, F)-logical wrapper: the transposes to/from the kernel's
    (T, F, B) view are layout bitcasts of the carry's native {0,2,1}."""
    out_tfb = ring_slab_write_tfb(
        jnp.transpose(ring_btf, (1, 2, 0)),
        jnp.transpose(entry_bf, (1, 0)).astype(ring_btf.dtype),
        cursor,
    )
    return jnp.transpose(out_tfb, (2, 0, 1))
