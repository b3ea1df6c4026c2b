"""Pallas first-conv kernel for the frame-ring visual act path (v2).

Why a kernel here: the visual act step's cost is dominated not by FLOPs but
by XLA:TPU layout traffic around conv1 — the round-5 profile of the best
XLA-only pipeline shows, per 1024-env step, ~0.28 ms of pure relayout
(carry -> row-major copy for masking, masked input -> conv's custom-tiled
{0,1,3,2} T(4,128) layout) plus 0.28 ms of fence/mask materialization around
a 0.12 ms convolution. This kernel computes conv1 + masking + /255 + bias +
relu in ONE pass that reads the ring in its NATIVE layout, so every
intermediate disappears.

Native layout: XLA lays the (B, T, F) bf16 ring out as {0,2,1}
(minor-to-major b, F, t) because row-major would sublane-pad T=4 -> 16 and
quadruple HBM traffic (measured, docs/PARITY.md round-5). The (T, F, B)
logical transpose of that layout is row-major, so this kernel takes the
(T, H, W/s, s, B) free view and the bracketing transposes are bitcasts.

MEASURED VERDICT (round 5, on chip): compiles, bit-correct, and
**0.379-0.387M env-steps/s vs 0.827M for the tuned XLA path** — default
OFF by data. The cost is MXU/VPU dispatch granularity: Mosaic's
strictly-2-D-matmul rule forces ~3200 (OC, KK) x (KK, 128) dots per env
step plus ~20k small strided vector loads for the im2col, and every
rank-merging reshape that would batch them ((OW, CH) -> (OW*CH), rank-1
results) is an "unsupported shape cast" (each measured). Matmul
reformulations that avoid im2col (banded x-selection matrices) pay a
W/k = 10.5x FLOP-redundancy tax instead. The kernel is kept: it is the
only bit-correct in-repo record of HOW to express a strided conv within
the Mosaic constraint map, and the XLA path's irreducible ~0.19 ms/step
conv-input relayout is exactly what a future Mosaic with batched dots
would recover (docs/PARITY.md round-5 ladder).

Design, shaped by the measured Mosaic constraint map (round 4/5, see
docs/PARITY.md and the memory notes in ops/layout_fence.py):

- **The input stays in HBM** (`memory_space=ANY`); for each (batch-block,
  output-row) the kernel DMAs the k-row y-band in ONE copy that keeps the
  pre-split s-axis whole — a DMA slice may not cut through the (s, lane)
  memref tile ("slice shape must be aligned to tiling", measured) — into a
  VMEM scratch (T, k, W/s, s, bb); x-phases are separated at vector-load
  time with STATIC indices (dynamic sublane indices must be multiples of
  8). The round-4 design's 6-D VMEM blocks lane-padded ~37x past the
  ~16 MB/core budget and could never fit.
- **y-stride via dynamic-start DMA slices** (band start = s*oy), which also
  handles the k > s halo that pallas's non-overlapping BlockSpecs cannot.
- **Double-buffered DMA**: scratch and semaphores are 2-slotted; each grid
  step issues the next band's DMA before computing the current one.
- **im2col in VMEM, fori-loop body**: a `fori_loop` over (t, ky) with the
  k-way kx unroll inside keeps the MLIR ~32x smaller than the round-4
  fully-unrolled body that OOM-killed the round-4 remote compiler; patch
  rows are masked by the (T, B) validity mask as they are built (invalid
  frames read as zero, exactly the XLA path's semantics).
- **Strictly 2-D matmuls** (Mosaic rule): per 128-lane batch chunk and
  output column, one (OC, KK) x (KK, 128) dot in f32 accumulation.

Output is (OH, OC, OW, B) row-major — the caller transposes to NHWC for
conv2, one small (13 MB at bench shape) XLA relayout.

Applicability (static): fc == 1, padding == 0, square kernel/stride with
k % s == H % s == W % s == (H-k) % s == (W-k) % s == 0, B % batch_block == 0
(`ring_conv_applicable`); callers fall back to the XLA path otherwise.

Correctness is pinned against the XLA convolution on random data in
interpret mode (tests/test_ring_conv.py) and by the visual pipeline's
bit-equality suite.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_ring_conv() -> bool:
    """Opt-in (PEARL_TPU_RING_CONV=1) until measured faster on chip; TPU
    callers additionally gate on backend == "tpu"."""
    return os.environ.get("PEARL_TPU_RING_CONV", "0") == "1"


def ring_conv_applicable(B, T, H, W, fc, k, s, p, batch_block) -> bool:
    return (
        fc == 1
        and p == 0
        and k % s == 0
        and H % s == 0
        and W % s == 0
        and (H - k) % s == 0
        and (W - k) % s == 0
        and B % batch_block == 0
        and batch_block % 128 == 0  # lane-aligned chunking
    )


def _kernel(
    ring5_ref, m_ref, w_ref, b_ref, out_ref, scratch5, patches, sems,
    *, T, H, W, k, s, bb, n_blocks,
):
    OH = (H - k) // s + 1
    OW = (W - k) // s + 1
    # Lane-aligned batch chunk per matmul (Mosaic: 2-D dots only).
    CH = min(128, bb)
    i = pl.program_id(0)  # batch block
    oy = pl.program_id(1)  # output row
    g = i * OH + oy

    def start_band(slot, bi, row):
        # ONE DMA per band, keeping the phase axis whole: slicing the
        # phase dim is illegal (it sits inside the (s, lane) memref tile —
        # "slice shape along dimension 3 must be aligned to tiling",
        # measured); phases are separated at vector-load time instead.
        pltpu.make_async_copy(
            ring5_ref.at[:, pl.ds(row * s, k), :, :, pl.ds(bi * bb, bb)],
            scratch5.at[slot],
            sems.at[slot],
        ).start()

    def wait_band(slot):
        # Matching descriptor; waits the copy tracked by sems[slot].
        pltpu.make_async_copy(
            ring5_ref.at[:, pl.ds(0, k), :, :, pl.ds(0, bb)],
            scratch5.at[slot],
            sems.at[slot],
        ).wait()

    @pl.when(g == 0)
    def _():
        start_band(0, 0, 0)

    last = n_blocks * OH - 1

    @pl.when(g < last)
    def _():
        nxt = g + 1
        start_band(nxt % 2, nxt // OH, nxt % OH)

    wait_band(g % 2)
    slot = g % 2

    # im2col into the 3-D `patches` scratch (KK, OW, CH) per 128-lane
    # chunk, then one strictly-2-D MXU dot per output column. fori loops
    # over (t, ky) and ox keep the MLIR ~32x smaller than the fully
    # unrolled round-4 body that OOM-killed the compiler, and no vector
    # reshape ever changes rank (Mosaic rejects rank-1 results and most
    # shape casts — measured).
    for c0 in range(0, bb, CH):

        def build(j, carry):
            t = j // k
            ky = j % k
            mt = m_ref[t, 0, :, pl.ds(c0, CH)]  # (1, CH) f32
            for kx in range(k):
                q, r = divmod(kx, s)
                sl = scratch5[
                    slot, t, ky, pl.ds(q, OW), r, pl.ds(c0, CH)
                ]  # (OW, CH)
                slm = sl.astype(jnp.float32) * mt  # broadcast (1,CH)->(OW,CH)
                patches[j * k + kx] = slm.astype(patches.dtype)
            return carry

        jax.lax.fori_loop(0, T * k, build, 0)

        # Static per-column dots: a fori here would need a DYNAMIC sublane
        # index into `patches`, which Mosaic only allows at multiples of 8
        # ("cannot statically prove index is a multiple of 8", measured);
        # static unaligned indices lower to sublane shifts and are fine.
        for ox in range(OW):
            p = patches[:, ox, :]  # (KK, CH)
            y = jax.lax.dot_general(
                w_ref[:], p,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (OC, CH)
            y = jnp.maximum(y + b_ref[:], 0.0)
            out_ref[0, :, ox, pl.ds(c0, CH)] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "k", "s", "batch_block")
)
def ring_conv1(ring, valid, wmat, bias, *, H, W, k, s, batch_block=512):
    """conv1 + mask + bias + relu over the ring window, native layout.

    ring:  (B, T, F) frames in ring order (the {0,2,1} carry)
    valid: (B, T) bool validity
    wmat:  (T*k*k, OC) kernel flattened in (t, ky, kx) order — pre-rotated
           by the cursor and pre-scaled by any input normalization
    bias:  (OC,)
    Returns (B, OH, OW, OC) NHWC (one small XLA relayout from the kernel's
    (OH, OC, OW, B) raw output).
    """
    B, T, F = ring.shape
    OH = (H - k) // s + 1
    OW = (W - k) // s + 1
    OC = wmat.shape[1]
    bb = batch_block
    KK = T * k * k
    # (T, F, B) is the bitcast view of the carry's native layout; the s-axis
    # pre-split gives the DMA its phase hyperrectangles.
    ring5 = jnp.transpose(ring, (1, 2, 0)).reshape(T, H, W // s, s, B)
    m = jnp.transpose(valid.astype(jnp.float32), (1, 0)).reshape(T, 1, 1, B)
    kern = functools.partial(
        _kernel, T=T, H=H, W=W, k=k, s=s, bb=bb, n_blocks=B // bb
    )
    out = pl.pallas_call(
        kern,
        grid=(B // bb, OH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ring5 stays in HBM
            pl.BlockSpec((T, 1, 1, bb), lambda i, oy: (0, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((KK, OC), lambda i, oy: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OC, 1), lambda i, oy: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, OC, OW, bb), lambda i, oy: (oy, 0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((OH, OC, OW, B), ring.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, T, k, W // s, s, bb), ring.dtype),
            pltpu.VMEM((KK, OW, min(128, bb)), ring.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OH * OW * OC * KK,
            bytes_accessed=2 * ring.size * ring.dtype.itemsize
            + B * OH * OW * OC * ring.dtype.itemsize,
            transcendentals=0,
        ),
    )(ring5, m, wmat.astype(ring.dtype), bias.reshape(OC, 1).astype(jnp.float32))
    return jnp.transpose(out, (3, 0, 2, 1))
