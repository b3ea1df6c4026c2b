"""Pallas ring-conv kernel vs the XLA convolution it replaces: identical
math (masking, /255-in-weights, bias, relu, cursor-rotated kernel) on random
data. Runs in interpret mode on CPU; on TPU the same kernel is the visual
act path's first conv (ops/ring_conv.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import pearl_tpu.ops.ring_conv as rc


def _reference(ring, valid, wmat, bias, H, W, k, s):
    B, T, F = ring.shape
    x = ring * valid[..., None].astype(ring.dtype)
    inp = x.reshape(B, T, H, W)
    OC = wmat.shape[1]
    w = wmat.reshape(T, k, k, OC).transpose(1, 2, 0, 3)  # HWIO
    y = jax.lax.conv_general_dilated(
        inp, w, window_strides=(s, s), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
    )
    return jnp.maximum(y + bias[None, None, None, :], 0.0)


def _run_interpreted(*args, **kw):
    orig = rc.pl.pallas_call
    rc.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        rc.ring_conv1.clear_cache()
        return rc.ring_conv1(*args, **kw)
    finally:
        rc.pl.pallas_call = orig
        rc.ring_conv1.clear_cache()


def test_ring_conv_matches_xla_conv():
    B, T, H, W, k, s, OC = 64, 4, 20, 20, 8, 4, 16
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ring = jax.random.normal(k1, (B, T, H * W), jnp.float32)
    valid = jax.random.bernoulli(k2, 0.8, (B, T))
    wmat = jax.random.normal(k3, (T * k * k, OC), jnp.float32) * 0.1
    bias = jax.random.normal(k4, (OC,), jnp.float32) * 0.1

    got = _run_interpreted(
        ring, valid, wmat, bias, H=H, W=W, k=k, s=s, batch_block=32
    )
    want = _reference(ring, valid, wmat, bias, H, W, k, s)
    assert got.shape == want.shape == (B, 4, 4, OC)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ring_conv_multi_block_and_row():
    # Atari-geometry miniature with >1 batch block (exercises the
    # double-buffered DMA slot rotation) and non-trivial OH.
    B, T, H, W, k, s, OC = 96, 3, 28, 28, 8, 4, 8
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ring = jax.random.normal(k1, (B, T, H * W), jnp.float32)
    valid = jax.random.bernoulli(k2, 0.6, (B, T))
    wmat = jax.random.normal(k3, (T * k * k, OC), jnp.float32) * 0.1
    bias = jax.random.normal(k4, (OC,), jnp.float32) * 0.1
    got = _run_interpreted(
        ring, valid, wmat, bias, H=H, W=W, k=k, s=s, batch_block=32
    )
    want = _reference(ring, valid, wmat, bias, H, W, k, s)
    OH = (H - k) // s + 1
    assert got.shape == (B, OH, OH, OC)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ring_conv_applicability_gate():
    assert rc.ring_conv_applicable(1024, 4, 84, 84, 1, 8, 4, 0, 512)
    assert rc.ring_conv_applicable(1024, 4, 84, 84, 1, 8, 4, 0, 128)
    assert not rc.ring_conv_applicable(1024, 4, 84, 84, 4, 8, 4, 0, 512)  # fc>1
    assert not rc.ring_conv_applicable(1024, 4, 84, 84, 1, 8, 4, 1, 512)  # pad
    assert not rc.ring_conv_applicable(100, 4, 84, 84, 1, 8, 4, 0, 512)  # B%bb
    assert not rc.ring_conv_applicable(1024, 4, 85, 84, 1, 8, 4, 0, 512)  # dims
    assert not rc.ring_conv_applicable(96, 4, 84, 84, 1, 8, 4, 0, 32)  # lane
