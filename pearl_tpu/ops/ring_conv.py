"""Pallas first-conv kernel for the frame-ring visual act path.

Why a kernel here at all: the round-4 profile (docs/PARITY.md "Round-4
visual ladder") showed the visual act path is bounded not by bytes or FLOPs
but by XLA:TPU's layout assignment — an XLA convolution that reads the
frame-ring loop carry drags the whole carry into a conv-friendly,
batch-minor layout, which turns the per-step ring slab write into a strided
full-ring rewrite (0.37 ms/step) and adds a relayout copy (0.19 ms/step).
Microbenchmarks put the same DUS at 0.003 ms/step when no conv reads the
carry. A Pallas kernel consumes standard row-major operands, so routing the
first conv through Pallas SEVERS that layout propagation: the ring's only
remaining consumers (dynamic-update-slice write, newest-frame slice) are
row-major-friendly.

The kernel computes the stride-s, no-padding first conv over the circular
window IN RING ORDER, with validity masking fused into the read:

    out[b, oy, ox, oc] = relu(bias[oc] +
        sum_{t,ky,kx} ring[b, t, (s*oy+ky)*W + (s*ox+kx)]
                      * valid[b, t] * Wmat[t*k*k + ky*k + kx, oc])

where Wmat is the (cursor-rotated, /255-folded) conv kernel flattened in
(t, ky, kx) order. The im2col happens in VMEM per batch block: k*k strided
slices per frame slot build the (BB*OH*OW, T*k*k) patch matrix for ONE MXU
matmul per block. Applicability (static): fc == 1, padding == 0, square
kernel/stride; callers fall back to the XLA path otherwise
(`ring_conv_applicable`).

Correctness is pinned against the XLA convolution on random data in
interpret mode on CPU (tests/test_ring_conv.py) and by the visual
pipeline's bit-equality suite on TPU shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_ring_conv() -> bool:
    """Opt-in (PEARL_TPU_RING_CONV=1). Default OFF: the kernel's math is
    pinned (tests/test_ring_conv.py, interpret mode) but the fully-unrolled
    body (T*k*k patch stores + per-row dots) OOM-killed this container's
    remote TPU compiler, so the end-to-end win is unverified on hardware.
    Mosaic constraints discovered while building it (each a measured
    compile failure, round 4): no strided vector slices (fold strides into
    a pre-kernel reshape and slice a 6-D ref); no big vector shape-casts
    (merge/split only the minor dims); minor-dim broadcast insertion and
    unit-dim inserts only for 32-bit types (route masks through f32);
    matmuls strictly 2-D (loop the batch block). Next step: lax.fori_loop
    body + dynamic ref indexing to shrink the MLIR, or a smaller unroll."""
    return os.environ.get("PEARL_TPU_RING_CONV", "0") == "1"


def ring_conv_applicable(B, T, H, W, fc, k, s, p, batch_block) -> bool:
    # The in-kernel im2col folds the stride into a reshape (Mosaic only
    # supports unit-stride vector slices), which needs k and the spatial
    # dims to be multiples of s.
    return (
        fc == 1
        and p == 0
        and k % s == 0
        and H % s == 0
        and W % s == 0
        and (H - k) % s == 0
        and (W - k) % s == 0
        and B % batch_block == 0
    )


def _kernel(
    ring6_ref, valid_ref, w_ref, b_ref, out_ref, scratch_ref, *, T, H, W, k, s
):
    OH = (H - k) // s + 1
    OW = (W - k) // s + 1
    BB = ring6_ref.shape[0]
    KK = T * k * k
    # Mosaic restrictions shape this kernel: no strided vector slices, no
    # big vector shape-casts / minor-dim stacks, and minor-dim broadcast
    # insertion only for 32-bit types. So (a) the stride-s fold
    # (B, T, H, W) -> (B, T, H/s, s, W/s, s) happens OUTSIDE as a free XLA
    # view and patches are read as unit-stride REF slices here (row
    # s*oy+ky with ky = s*p+u lives at [..., oy+p, u, ...]); (b) the patch
    # matrix is assembled FEATURE-MAJOR in a VMEM scratch via contiguous
    # stores (scratch[j] = slice), so the matmul runs transposed:
    # out(OC, N) = W^T (OC, KK) @ patches (KK, N).
    mask = valid_ref[:]  # (BB, T) f32
    for t in range(T):
        mt = mask[:, t][:, None]  # f32 insertion: allowed
        for ky in range(k):
            p, u = divmod(ky, s)
            for kx in range(k):
                q, r = divmod(kx, s)
                sl = ring6_ref[:, t, p : p + OH, u, q : q + OW, r]
                sl2 = (sl.astype(jnp.float32).reshape(BB, OH * OW) * mt)
                scratch_ref[t * k * k + ky * k + kx] = sl2.astype(
                    scratch_ref.dtype
                )
    # Mosaic matmuls are strictly 2-D and the (KK, BB, N) -> (KK, BB*N)
    # merge is an unsupported shape cast, so the contraction loops over the
    # (small) batch block: BB dots of (KK, OC)^T @ (KK, N).
    del KK
    for b in range(BB):
        yb = jax.lax.dot_general(
            w_ref[:], scratch_ref[:, b, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (OC, OH*OW)
        yb = jnp.maximum(yb + b_ref[:][:, None], 0.0)
        n = yb.shape[1]
        out_ref[:, b * n : (b + 1) * n] = yb.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "k", "s", "batch_block"))
def ring_conv1(ring, valid, wmat, bias, *, H, W, k, s, batch_block=32):
    """conv1 + bias + relu over the masked ring window.

    ring:  (B, T, H*W) frames in ring order (any float dtype)
    valid: (B, T) bool validity
    wmat:  (T*k*k, OC) kernel flattened in (t, ky, kx) order — pre-rotated
           by the cursor and pre-scaled by any input normalization
    bias:  (OC,)
    Returns (OC, B*OH*OW) in ring.dtype (channel-major — the kernel's
    matmul runs transposed; callers transpose/reshape to NHWC outside,
    where XLA's transpose is a cheap bandwidth-bound pass).
    """
    B, T, F = ring.shape
    OH = (H - k) // s + 1
    OW = (W - k) // s + 1
    OC = wmat.shape[1]
    BB = batch_block
    ring6 = ring.reshape(B, T, H // s, s, W // s, s)  # free row-major view
    kern = functools.partial(_kernel, T=T, H=H, W=W, k=k, s=s)
    return pl.pallas_call(
        kern,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec(
                (BB, T, H // s, s, W // s, s),
                lambda i: (i, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((BB, T), lambda i: (i, 0), memory_space=pltpu.VMEM),  # f32
            pl.BlockSpec((T * k * k, OC), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OC,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (OC, BB * OH * OW), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((OC, B * OH * OW), ring.dtype),
        scratch_shapes=[pltpu.VMEM((T * k * k, BB, OH * OW), ring.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OH * OW * OC * T * k * k,
            bytes_accessed=ring.size * ring.dtype.itemsize
            + B * OH * OW * OC * ring.dtype.itemsize,
            transcendentals=0,
        ),
    )(ring6, valid.astype(jnp.float32), wmat.astype(ring.dtype), bias.astype(jnp.float32))
