"""Standalone repro: XLA:TPU turns an O(slab) loop-carry update into an
O(carry) rewrite the moment a convolution reads the carry.

The pattern is a frame ring: a scan carries a (B, T, H*W) window and each
step writes ONE (B, 1, H*W) slab via dynamic_update_slice. In isolation the
update is in-place (~us). Add a convolution that READS the carry inside the
same step (any RL act path: conv over the frame stack) and two things
happen:

1. layout assignment gives the carry the conv-friendly batch-minor layout
   {0,2,1} (which is also the padding-minimal choice for T=4 bf16 — row
   major would sublane-pad 4 -> 16), and
2. the DUS fuses with the producer of the new frame into a multi-output
   fusion that REWRITES THE WHOLE CARRY every step — a ~100x cliff on the
   update cost that no layout pin fixes (`with_layout_constraint` row-major
   made it worse in the round-4 ladder; see docs/PARITY.md).

Run on a TPU host: `python docs/xla_layout_repro.py [B] [T] [HW] [steps]`.
Measured on v5e (1024 x 4 x 7056 bf16, 64-step scan, 2026-08-21):

    isolated DUS    : 0.0117 ms/step
    conv reads carry: 1.1871 ms/step   -> 101.5x cliff

(The conv itself accounts for ~0.12 ms of the 1.19; the remaining ~1.06 ms
is the full-carry rewrite plus relayout copies.)

The production workaround is pearl_tpu/ops/ring_write.py (a Pallas call
whose output aliases the ring operand and whose body DMAs only the slab)
plus pearl_tpu/ops/ring_conv.py (conv1 reads the ring in its native layout
inside a kernel). This file exists so the pathology can be reported
upstream in isolation.
"""

import sys
import time

import jax
import jax.numpy as jnp


def build(B, T, HW, steps, with_conv):
    k0 = jnp.ones((8, 8, T, 16), jnp.bfloat16) * 0.01

    def step(ring, x):
        # One slab write per step (the O(frame) update under test).
        entry = (x * jnp.ones((B, 1, HW), jnp.bfloat16))
        ring = jax.lax.dynamic_update_slice(ring, entry, (0, 0, 0))
        out = 0.0
        if with_conv:
            # A convolution that reads the carry — the trigger.
            H = W = int(HW ** 0.5)
            img = ring.reshape(B, T, H, W)
            y = jax.lax.conv_general_dilated(
                img, k0, (4, 4), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
            )
            out = jnp.sum(y.astype(jnp.float32))
        return ring, out

    @jax.jit
    def run(ring, xs):
        ring, outs = jax.lax.scan(step, ring, xs)
        return ring, outs

    return run


def measure(with_conv, B, T, HW, steps):
    run = build(B, T, HW, steps, with_conv)
    ring = jnp.zeros((B, T, HW), jnp.bfloat16)
    xs = jnp.ones((steps, B, 1, HW), jnp.bfloat16)
    ring, outs = run(ring, xs)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        ring, outs = run(ring, xs)
    jax.block_until_ready(outs)
    per_step_ms = (time.perf_counter() - t0) / (reps * steps) * 1e3
    tag = "conv reads carry" if with_conv else "isolated DUS   "
    print(f"{tag}: {per_step_ms:.4f} ms/step  (B={B} T={T} HW={HW})")
    return per_step_ms

if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    B, T, HW, steps = (args + [1024, 4, 7056, 64][len(args):])[:4]
    base = measure(False, B, T, HW, steps)
    conv = measure(True, B, T, HW, steps)
    print(f"cliff: {conv / base:.1f}x (conv itself accounts for a fraction; "
          "the rest is the full-carry rewrite + relayout)")
