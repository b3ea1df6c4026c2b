"""Pytree utilities: the TPU-native equivalents of the reference's state_dict
comparison (pearl/utils/module_utils.py:15-100), target-network soft updates
(pearl/neural_networks/common/utils.py:215-227), and per-env conditional state
updates (needed because batched envs reset asynchronously — SURVEY.md §7)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def tree_select(cond: jnp.ndarray, on_true: Any, on_false: Any) -> Any:
    """`jnp.where` over every leaf, broadcasting `cond` from the left.

    `cond` has shape (B,) (or scalar); leaves have shape (B, ...). Used for
    per-env auto-reset and done-gated state updates inside vmapped/scanned
    loops.
    """

    def _sel(a, b):
        c = cond
        while c.ndim < a.ndim:
            c = c[..., None]
        return jnp.where(c, a, b)

    return jax.tree.map(_sel, on_true, on_false)


def soft_update(target: Any, source: Any, tau: float) -> Any:
    """target <- tau * source + (1 - tau) * target.

    Matches the reference's `update_target_network`
    (pearl/neural_networks/common/utils.py:215-227), which with tau=1
    becomes a hard copy. Equivalent to optax.incremental_update but kept
    local so it works on arbitrary pytrees.
    """
    return jax.tree.map(lambda t, s: t + tau * (s - t), target, source)


def tree_allclose(a: Any, b: Any, rtol: float = 1e-5, atol: float = 1e-7) -> bool:
    """True if two pytrees have identical structure and allclose leaves."""
    if jax.tree.structure(a) != jax.tree.structure(b):
        return False
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    for la, lb in zip(leaves_a, leaves_b):
        la, lb = jnp.asarray(la), jnp.asarray(lb)
        if la.shape != lb.shape:
            return False
        if not jnp.allclose(la, lb, rtol=rtol, atol=atol):
            return False
    return True


def compare(a: Any, b: Any, rtol: float = 1e-5, atol: float = 1e-7) -> str:
    """Human-readable diff of two state pytrees; "" when equivalent.

    The reference requires a `compare()` on every component and tests it
    heavily (test/unit/with_pytorch/test_compare.py). With pytree states this
    reduces to structural + numeric comparison, but the API is kept explicit.
    """
    diffs = []
    try:
        sa, sb = jax.tree.structure(a), jax.tree.structure(b)
    except Exception as e:  # non-pytree inputs
        return f"could not flatten inputs: {e}"
    if sa != sb:
        return f"pytree structures differ: {sa} vs {sb}"
    paths_a = jax.tree_util.tree_flatten_with_path(a)[0]
    paths_b = jax.tree_util.tree_flatten_with_path(b)[0]
    for (path, la), (_, lb) in zip(paths_a, paths_b):
        la, lb = jnp.asarray(la), jnp.asarray(lb)
        name = jax.tree_util.keystr(path)
        if la.shape != lb.shape:
            diffs.append(f"{name}: shape {la.shape} vs {lb.shape}")
        elif not jnp.issubdtype(la.dtype, jnp.inexact):
            # Integer/bool leaves (step counters, cursors, PRNG keys) compare
            # EXACTLY: allclose's relative tolerance would swallow small
            # deltas on large values (e.g. +-1 on a uint32 PRNG key word).
            if not jnp.array_equal(la, lb):
                diffs.append(f"{name}: integer/bool leaves differ")
        elif not jnp.allclose(la, lb, rtol=rtol, atol=atol):
            diffs.append(
                f"{name}: max abs diff {float(jnp.max(jnp.abs(la - lb))):.3e}"
            )
    return "; ".join(diffs)
