"""Pallas layout fence vs the XLA masking path it replaces: identical math
(`ring * valid / 255`) on random data, all dtypes the visual pipeline uses.
Runs in interpret mode on CPU; on TPU the same kernel guards the visual
conv inputs' producer layouts (ops/layout_fence.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import pearl_tpu.ops.layout_fence as lf


def _run_interpreted(fn, *args, **kw):
    orig = lf.pl.pallas_call
    lf.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        fn.clear_cache()
        return fn(*args, **kw)
    finally:
        lf.pl.pallas_call = orig
        fn.clear_cache()


def test_fence_matches_xla_masking_f32():
    B, T, F = 48, 4, 300  # F lane-pads 300 -> 384; rows=192 -> rb 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ring = jax.random.uniform(k1, (B, T, F), jnp.float32) * 255.0
    valid = jax.random.bernoulli(k2, 0.7, (B, T))
    got = _run_interpreted(lf.masked_scale_fence, ring, valid, div=255.0)
    # The kernel normalizes via explicit reciprocal multiply (the rewrite
    # XLA applies to division by a constant): exact vs the same expression,
    # 1 ulp vs a true divide.
    want = (ring * valid[..., None].astype(ring.dtype)) * np.float32(
        1.0 / 255.0
    )
    assert got.dtype == ring.dtype and got.shape == ring.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    true_div = (ring * valid[..., None].astype(ring.dtype)) / 255.0
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(true_div), rtol=2e-7, atol=0
    )


def test_fence_bf16_and_unit_div():
    B, T, F = 8, 4, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    ring = (jax.random.uniform(k1, (B, T, F)) * 255.0).astype(jnp.bfloat16)
    valid = jax.random.bernoulli(k2, 0.5, (B, T))
    got = _run_interpreted(lf.masked_scale_fence, ring, valid, div=1.0)
    # Mask multiply is exact in any precision (mask is 0/1).
    want = ring * valid[..., None].astype(ring.dtype)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_fence4_matches_xla_masking():
    B, T, H, W = 12, 4, 10, 9
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    ring = jax.random.uniform(k1, (B, T, H * W), jnp.float32) * 255.0
    valid = jax.random.bernoulli(k2, 0.6, (B, T))
    got = _run_interpreted(lf.masked_scale_fence4, ring, valid, H=H, W=W)
    want = (
        (ring * valid[..., None].astype(ring.dtype)) * np.float32(1.0 / 255.0)
    ).reshape(B, T, H, W)
    assert got.shape == (B, T, H, W)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_copy_fence_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(3), (24, 300), jnp.float32)
    got = _run_interpreted(lf.copy_fence, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))
    xb = x.astype(jnp.bfloat16)
    got = _run_interpreted(lf.copy_fence, xb)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(xb, np.float32)
    )


def test_fence_opt_in_via_env(monkeypatch):
    monkeypatch.delenv("PEARL_TPU_LAYOUT_FENCE", raising=False)
    assert not lf.use_layout_fence()  # opt-in until measured faster on chip
    monkeypatch.setenv("PEARL_TPU_LAYOUT_FENCE", "1")
    assert lf.use_layout_fence()


def test_ring_slab_write_in_place_semantics():
    import pearl_tpu.ops.ring_write as rw

    B, T, F = 6, 4, 40
    ring = jax.random.normal(jax.random.PRNGKey(4), (B, T, F), jnp.float32)
    entry = jax.random.normal(jax.random.PRNGKey(5), (B, F), jnp.float32)
    for c in range(T):
        orig = rw.pl.pallas_call
        rw.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            rw.ring_slab_write_tfb.clear_cache()
            got = rw.ring_write(ring, entry, jnp.int32(c))
        finally:
            rw.pl.pallas_call = orig
            rw.ring_slab_write_tfb.clear_cache()
        want = ring.at[:, c, :].set(entry)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_slab_write_where_semantics():
    import pearl_tpu.ops.ring_write as rw

    B, T, F = 6, 3, 48
    key = jax.random.PRNGKey(6)
    k1, k2, k3 = jax.random.split(key, 3)
    ring = jax.random.normal(k1, (B, T, F), jnp.float32)
    obs = jax.random.normal(k2, (B, F), jnp.float32)
    reset = jax.random.normal(k3, (B, F), jnp.float32)
    done = jnp.array([True, False, True, False, False, True])
    for c in range(T):
        orig = rw.pl.pallas_call
        rw.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            rw.ring_slab_write_where_tfb.clear_cache()
            got_tfb = rw.ring_slab_write_where_tfb(
                jnp.transpose(ring, (1, 2, 0)), obs.T, reset.T, done,
                jnp.int32(c),
            )
        finally:
            rw.pl.pallas_call = orig
            rw.ring_slab_write_where_tfb.clear_cache()
        got = jnp.transpose(got_tfb, (2, 0, 1))
        entry = jnp.where(done[:, None], reset, obs)
        want = ring.at[:, c, :].set(entry)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
