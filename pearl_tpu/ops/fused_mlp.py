"""Fused MLP forward as a single Pallas TPU kernel.

Why: the act-path Q computation at production env counts is HBM-bound, not
FLOP-bound. XLA:TPU compiles each Dense layer as its own fusion, so every
hidden activation round-trips HBM — at 131072 envs with 64-wide hiddens
that is ~134 MB of intermediate traffic per env step, ~0.17 ms at HBM
bandwidth, comparable to the entire rest of the fused training step
(docs/PARITY.md). This kernel runs the whole relu-MLP chain in one
`pallas_call`: weights live in VMEM for the kernel's lifetime, activations
never leave VMEM, HBM traffic collapses to `read x + write out`.

Differentiable via `jax.custom_vjp`: forward is the Pallas kernel, backward
re-derives gradients through a plain jnp reference chain (exact same math),
so the kernel is safe inside `jax.grad` — learners can call it from losses.

Only plain MLPs qualify (relu hiddens, linear output — the shape of every
Q/value net in the zoo when layer norm/dropout/skip are off). Use
`fused_mlp_from_flax` to apply it to a flax `MLP` param dict, with an
automatic fallback to the reference chain off-TPU or for exotic configs.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_TILE_B = 1024  # batch rows per kernel program


def _reference_forward(x: jnp.ndarray, wb: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Plain jnp relu-MLP chain — the semantics the kernel must match."""
    h = x
    n_layers = len(wb) // 2
    for i in range(n_layers):
        h = h @ wb[2 * i] + wb[2 * i + 1]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h


def _pallas_forward(x: jnp.ndarray, wb: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(wb) // 2
    out_dim = wb[-1].shape[-1]
    B, D = x.shape

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        h = x_ref[:]
        for i in range(n_layers):
            w = refs[2 * i][:]
            b = refs[2 * i + 1][:]
            # b is (1, H): broadcasts over the batch tile.
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        out_ref[:] = h

    tile = min(_TILE_B, B)
    padded = ((B + tile - 1) // tile) * tile
    if padded != B:
        x = jnp.pad(x, ((0, padded - B), (0, 0)))
    grid = (padded // tile,)
    # Biases enter as (1, H) rows (TPU wants >= 2-D operands).
    wb2d = [w if w.ndim == 2 else w[None, :] for w in wb]
    in_specs = [
        pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in wb2d
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, out_dim), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, *wb2d)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp(x, *wb):
    """relu-MLP chain: x @ W1 + b1 -> relu -> ... -> @ Wn + bn.

    wb = (W1, b1, W2, b2, ..., Wn, bn)."""
    return _pallas_forward(x, tuple(wb))


def _fused_fwd(x, *wb):
    return fused_mlp(x, *wb), (x, wb)


def _fused_bwd(res, g):
    x, wb = res
    _, vjp = jax.vjp(lambda x_, *wb_: _reference_forward(x_, wb_), x, *wb)
    return vjp(g)


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def use_fused_mlp() -> bool:
    """Opt-in (PEARL_TPU_FUSED_MLP=1) and TPU-only.

    MEASURED NEGATIVE RESULT (v5e, bench.py workload, 131072 envs): wiring
    this kernel into the MultiHead-DQN act path drops the fused training
    step from 489M to 95M env-steps/s, flat across batch tiles 1024-8192.
    XLA:TPU already lowers the tiny-K dense chain (4 -> 64 -> 64 -> 2) into
    well-fused vector code with no HBM round-trips worth saving, so the
    pallas_call only adds kernel-boundary overhead inside the scan. Kept as
    a validated, differentiable building block (exact-match tests incl.
    custom-VJP grads) for genuinely HBM-bound MLP shapes — wide hiddens or
    long chains — where the VMEM-resident chain wins."""
    import os

    return (
        os.environ.get("PEARL_TPU_FUSED_MLP", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def flax_mlp_wb(params: dict) -> Tuple[jnp.ndarray, ...]:
    """Extract (W, b) pairs from a `pearl_tpu.neural_networks.common.MLP`
    param dict in layer order (dense_0, dense_1, ..., dense_out)."""
    names = sorted(
        (k for k in params if k.startswith("dense_") and k != "dense_out"),
        key=lambda k: int(k.split("_")[1]),
    ) + ["dense_out"]
    wb = []
    for name in names:
        wb.append(params[name]["kernel"])
        wb.append(params[name]["bias"])
    return tuple(wb)


def fused_mlp_from_flax(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Run a flax MLP param dict through the fused kernel (TPU) or the
    reference jnp chain (everywhere else). Semantics = MLP(hidden relu,
    linear dense_out, no layer norm / dropout / skip)."""
    wb = flax_mlp_wb(params)
    if use_fused_mlp():
        return fused_mlp(x, *wb)
    return _reference_forward(x, wb)
