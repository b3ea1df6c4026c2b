"""Incremental conv1 cache for the visual act path (the layout-cliff bypass).

Round 4/5 established that XLA:TPU's layout assignment makes any conv that
reads a loop carry catastrophically expensive (101.5x isolated cliff,
docs/xla_layout_repro.py), and that neither layout fences nor a Pallas conv
recover it (measured ladder, docs/PARITY.md "Round-5 visual ladder"). This
module removes the per-step window conv entirely instead of fighting its
layout:

conv1 is LINEAR in its input, and its input channels are the T stacked
frames, so

    conv1(window)[b] = sum_s  conv(frame_s, K_{p(s)})[b]

where p(s) = (s - cursor) % T is frame s's time position in the window
(0 = oldest, T-1 = newest; frame_ring.py). Only ONE frame enters the window
per step, so the act path caches each resident frame's contribution under
ALL T position-kernels — computed ONCE when the frame arrives, by a conv
whose input is the fresh env observation (never a carry: no layout cliff) —
and reduces conv1(window) to a T-term masked sum over cached slabs.

DIAGONAL cache layout — the key to doing this without per-step transposes:
entry (j, p) holds contrib(frame in ring slot s = (j + p) % T, kernel
position p), i.e. j = (s - p) % T. Then at read time EVERY position the
current window needs lives in the single row j == cursor (because the frame
at position p is in slot (cursor + p) % T), so the act-path gather is ONE
contiguous dynamic slice; and the new frame (written at slot c = old
cursor) scatters its T position-contributions to rows j = (c - p) % T — T
small aligned DMAs in the Pallas write kernel. The cache array is stored in
the kernel's native (T, P, D, B) row-major order with D = OH*OW*OC in conv
output channel order, so the conv output, the DMA source, the gather result
and conv2's preferred batch-minor input layout are all BITCASTS of each
other.

Exactness: contributions are computed with the CURRENT conv1 weights, and
`PearlAgent.learn` refreshes the whole cache after every weight update, so
the cached conv1 output always uses up-to-date weights. The only deviation
from the direct conv is float summation grouping (T partial f32-accumulated
convs summed in f32, vs one conv f32-accumulating over all T*k*k taps) —
ulp-level, covered by tolerance tests (tests/test_conv_cache.py).

Reference anchor: accelerates the same acting stack as
pearl/history_summarization_modules/stacking_history_summarization_module.py
feeding pearl/neural_networks/sequential_decision_making/q_value_networks.py
CNNQValueNetwork's first conv layer.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_conv1_cache() -> bool:
    """Kill-switch for the conv1-cache act path (PEARL_TPU_CONV1_CACHE=0
    restores the direct window conv even when the network enables the
    cache). Default ON for networks configured with conv1_cache=True."""
    return os.environ.get("PEARL_TPU_CONV1_CACHE", "1") == "1"


def contrib_chunks(y, T, OC):
    """Split a contrib conv output (B, OH, OW, T*OC) into per-position
    (D, B) chunks, D = OH*OW*OC. On TPU the conv output is batch-minor
    ([OH][OW][C][B] physical), so each chunk is a strided VIEW with
    contiguous (OC, B) runs — bitcast-friendly, no data movement until the
    consumer DMAs it."""
    B, OH, OW, C = y.shape
    y_dcb = jnp.transpose(y, (1, 2, 3, 0)).reshape(OH * OW, T * OC, B)
    return [
        y_dcb[:, p * OC : (p + 1) * OC, :].reshape(OH * OW * OC, B)
        for p in range(T)
    ]


def _write_kernel(cursor_ref, y_ref, cache_ref, out_ref, sems, *, T, OC):
    # out_ref aliases cache_ref ((T, P, D, B)): only the new frame's T
    # position-chunks move, each to its diagonal row j = (cursor - p) % T.
    # All T DMAs are started before any is awaited so they overlap.
    del cache_ref
    c = cursor_ref[0]
    D = out_ref.shape[2]
    OHW = D // OC
    dmas = []
    for p in range(T):
        j = jax.lax.rem(c - p + T, T)
        src = y_ref.at[:, pl.ds(p * OC, OC), :]
        dst = out_ref.at[j, p]
        dmas.append(
            pltpu.make_async_copy(src, dst.reshape(OHW, OC, dst.shape[-1]), sems.at[p])
        )
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()


@functools.partial(jax.jit, static_argnames=("T", "OC"))
def _cache_write_tpu(cache, y_dcb, cursor, *, T, OC):
    P, D, B = cache.shape[1], cache.shape[2], cache.shape[3]
    kernel = functools.partial(_write_kernel, T=T, OC=OC)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((T, P, D, B), cache.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((T,))],
        input_output_aliases={2: 0},
    )(jnp.reshape(cursor, (1,)).astype(jnp.int32), y_dcb, cache)


def cache_write(cache, y, cursor, *, T, OC):
    """cache[(cursor - p) % T, p] <- chunk_p(y) for all positions p, in
    place on TPU.

    cache: (T, P, D, B) diagonal contribution cache
    y:     (B, OH, OW, T*OC) contrib conv output for the new frame (the
           frame the ring write just placed at slot `cursor`)
    """
    B, OH, OW, C = y.shape
    if jax.default_backend() == "tpu":
        y_dcb = jnp.transpose(y, (1, 2, 3, 0)).reshape(OH * OW, C, B)
        return _cache_write_tpu(cache, y_dcb.astype(cache.dtype), cursor, T=T, OC=OC)
    chunks = contrib_chunks(y, T, OC)
    for p, chunk in enumerate(chunks):
        j = (cursor - p) % T
        cache = jax.lax.dynamic_update_slice(
            cache, chunk[None, None].astype(cache.dtype), (j, p, 0, 0)
        )
    return cache


def gather_sum(cache, valid, cursor):
    """sum_p valid[:, (cursor + p) % T] * cache[cursor, p] -> (D, B) f32.

    The diagonal layout puts every position the current window needs in row
    j == cursor, so this is ONE contiguous dynamic slice plus a T-term
    masked sum. Invalid slots (episode zero padding) contribute zero,
    exactly like the masked-window conv this replaces."""
    T = cache.shape[0]
    slab = jax.lax.dynamic_slice_in_dim(cache, cursor, 1, axis=0)[0]  # (P,D,B)
    acc = jnp.zeros(slab.shape[1:], jnp.float32)
    for p in range(T):
        s = (cursor + p) % T
        v = jax.lax.dynamic_slice_in_dim(valid, s, 1, axis=1)[:, 0]  # (B,)
        acc = acc + slab[p].astype(jnp.float32) * v[None, :].astype(jnp.float32)
    return acc


