"""Pallas layout fence for the visual pipeline's conv inputs.

The round-4 xplane profile (docs/PARITY.md "Round-4 visual ladder") pinned
~0.6 ms of the 1.2 ms visual step to XLA:TPU layout assignment, not to
algorithmic traffic: a convolution that (transitively) reads an array forces
a conv-friendly batch-minor layout onto that array's PRODUCER chain. Two
chains are poisoned this way:

- act path: conv1 reads the frame-ring loop CARRY -> the carry goes
  batch-minor -> the per-step ring slab write becomes a strided full-carry
  rewrite (0.37 ms/step vs 0.003 ms isolated);
- learn path: conv1 reads the replay-sampled stacks -> the layout propagates
  back through the sample gathers into the (capacity, F) replay frame ring
  -> every push pays a column-major scatter (0.14 ms/step).

A Pallas call has fixed row-major operand/result layouts, so XLA layout
assignment CANNOT propagate through it. This module's `masked_scale_fence`
is the smallest useful such barrier: it computes the masking + input
normalization the visual path needs anyway (`ring * valid / 255`), so the
fence costs one ring-sized write where the unfenced path already paid a
ring-sized read+write for the mask multiply (0.09 ms/step) — the barrier is
effectively free, and it confines the conv's exotic layout to the fence
OUTPUT (a short-lived temporary) instead of the loop carry / replay ring.

Measured on chip (round 5, 84x84x4, 1024 envs, bench_cnn_ring.py): fence
OFF 0.82M env-steps/s, fence ON — see docs/PARITY.md round-5 table.

This is deliberately NOT the fused ring-conv kernel (ops/ring_conv.py): the
fence keeps the convolution itself in XLA (full autodiff, any geometry, any
frame_channels) and needs none of the Mosaic-hostile im2col machinery — a
~20-line elementwise kernel that compiles everywhere. Default ON for TPU
backends; PEARL_TPU_LAYOUT_FENCE=0 restores the plain XLA path.

Reference anchor: the visual pipeline this accelerates implements the Atari
preprocessing stack of pearl/utils/scripts/benchmark_config.py:1679-1747;
the reference (PyTorch, eager) has no analogous layout problem or fix.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_layout_fence() -> bool:
    """Conv-input fences (masked_scale_fence/-4), opt-in: measured NET
    NEGATIVE on chip standalone (the carry<->ring layout cycle survives and
    the fence only adds copies; docs/PARITY.md round-5 ladder);
    PEARL_TPU_LAYOUT_FENCE=1 enables. TPU callers additionally gate on
    backend == "tpu"."""
    return os.environ.get("PEARL_TPU_LAYOUT_FENCE", "0") == "1"


def use_push_fence() -> bool:
    """Push-path copy_fence, default ON by measurement: it flips the replay
    frame rings row-major (push scatter 0.13 ms/step -> off the profile)
    and with the in-place ring write takes the visual bench 791k -> 827k
    env-steps/s (round-5 ladder). Gated separately from the conv-input
    fences (which measured net-negative); PEARL_TPU_PUSH_FENCE=0 opts
    out."""
    return os.environ.get("PEARL_TPU_PUSH_FENCE", "1") == "1"


def _fence4_kernel(x_ref, m_ref, o_ref, *, div):
    # 4-D variant: block (bb, T, H, W); mask arrives pre-shaped (bb, T, 1, 1)
    # so the kernel only BROADCASTS it (in-kernel unit-dim insertion —
    # tpu.reshape (bb,T) -> (bb,T,1,1) — is a Mosaic "unsupported shape
    # cast", measured round 5).
    y = x_ref[:].astype(jnp.float32) * m_ref[:]
    if div != 1.0:
        y = y * jnp.float32(1.0 / div)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("div", "H", "W")
)
def masked_scale_fence4(ring, valid, *, H, W, div=255.0):
    """`masked_scale_fence` emitting the 4-D (B, T, H, W) NCHW conv input
    directly. The (B, T, F) -> (B, T, H, W) split is a free row-major view
    on the INPUT side; doing it inside the fence means no XLA reshape sits
    between the fence and the convolution (measured on chip: XLA
    materialized that reshape as a 0.22 ms/step copy instead of a bitcast,
    round-5 ladder in docs/PARITY.md)."""
    B, T, F = ring.shape
    assert F == H * W
    x = ring.reshape(B, T, H, W)  # free row-major view
    m = valid.astype(jnp.float32).reshape(B, T, 1, 1)
    # (H, W) lane-tiles to (ceil8(H), ceil128(W)) for f32, twice that
    # sublane count for bf16 — small blocks keep padded in+out double
    # buffers well under the ~16 MB/core VMEM budget.
    hp = -(-H // 8) * 8
    wp = -(-W // 128) * 128
    per_b = T * hp * wp * ring.dtype.itemsize * 2 * 2
    bb = next(
        (r for r in (64, 32, 16, 8, 4, 2, 1) if B % r == 0 and r * per_b <= 8 * 2**20),
        1,
    )
    return pl.pallas_call(
        functools.partial(_fence4_kernel, div=div),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 1, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, T, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W), ring.dtype),
    )(x, m)


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@jax.jit
def copy_fence(x):
    """Identity behind a layout barrier, for severing a layout-propagation
    CYCLE rather than a chain: on the visual act path the loop carry and the
    replay frame ring pin each other batch/column-minor through the push
    (newest-frame slice -> ring row write share layouts in both directions),
    so even with the conv fenced off the pathological fixed point survives.
    Fencing the pushed frame (a single (B, F) row per step, ~2% of the
    ring-sized traffic) breaks the cycle. Bit-exact passthrough."""
    B, F = x.shape
    fp = -(-F // 128) * 128
    per_row = fp * x.dtype.itemsize * 2 * 2
    rb = next(
        (r for r in (128, 64, 32, 16, 8, 4, 2, 1) if B % r == 0 and r * per_row <= 8 * 2**20),
        1,
    )
    return pl.pallas_call(
        _copy_kernel,
        grid=(B // rb,),
        in_specs=[pl.BlockSpec((rb, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), x.dtype),
    )(x)


def _fence_kernel(x_ref, m_ref, o_ref, *, div):
    # f32 compute: the mask multiply is exact in any precision (mask is
    # 0/1), and the /div normalization is an explicit reciprocal multiply —
    # the same rewrite XLA applies to division by a constant — so the fence
    # matches the unfenced `ring * valid / div` path to 1 ulp (f32; exact
    # where div == 1). The (RB, 1) -> (RB, F) minor-dim broadcast must run
    # in f32: Mosaic only supports minor-dim unit broadcasts for 32-bit
    # types (round-4 measured constraint).
    y = x_ref[:].astype(jnp.float32) * m_ref[:]
    if div != 1.0:
        y = y * jnp.float32(1.0 / div)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("div",))
def masked_scale_fence(ring, valid, div=255.0):
    """`ring * valid[..., None] / div` behind a layout barrier.

    ring:  (B, T, F) float frames
    valid: (B, T) bool slot-validity mask
    Returns (B, T, F) in ring.dtype, produced with a row-major layout that
    XLA cannot override (see module docstring).
    """
    B, T, F = ring.shape
    rows = B * T
    x = ring.reshape(rows, F)  # free row-major view
    m = valid.reshape(rows, 1).astype(jnp.float32)
    # Row-block sizing: keep in+out double-buffered VMEM under ~8 MB of the
    # ~16 MB/core budget (F lane-pads to a multiple of 128).
    fp = -(-F // 128) * 128
    per_row = fp * (ring.dtype.itemsize + ring.dtype.itemsize) * 2
    rb = next(
        (r for r in (128, 64, 32, 16, 8, 4, 2, 1) if rows % r == 0 and r * per_row <= 8 * 2**20),
        1,
    )
    out = pl.pallas_call(
        functools.partial(_fence_kernel, div=div),
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, F), ring.dtype),
    )(x, m)
    return out.reshape(B, T, F)
