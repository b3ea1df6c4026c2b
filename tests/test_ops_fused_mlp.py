"""Fused-MLP Pallas kernel (pearl_tpu/ops/fused_mlp.py): exact equivalence
with the flax MLP chain (interpret mode on CPU) and custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.neural_networks.q_value_networks import (
    MultiHeadQValueNetwork,
    _MultiHeadNet,
)
from pearl_tpu.ops.fused_mlp import (
    _pallas_forward,
    _reference_forward,
    flax_mlp_wb,
    fused_mlp,
)


def _setup(B=37, hidden=(64, 64), out=2, din=4):
    net = MultiHeadQValueNetwork(hidden_dims=hidden)
    params = net.init(jax.random.PRNGKey(0), din, out, out)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, din))
    return net, params, x


def test_fused_mlp_matches_flax_forward():
    net, params, x = _setup()
    ref = _MultiHeadNet((64, 64), 2).apply({"params": params}, x)
    wb = flax_mlp_wb(params["MLP_0"])
    np.testing.assert_allclose(
        np.asarray(_reference_forward(x, wb)), np.asarray(ref), rtol=1e-6
    )
    out = _pallas_forward(x, tuple(wb))  # interpret mode off-TPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_grads_match_flax():
    net, params, x = _setup()

    def loss_fused(params):
        return jnp.sum(fused_mlp(x, *flax_mlp_wb(params["MLP_0"])) ** 2)

    def loss_ref(params):
        return jnp.sum(_MultiHeadNet((64, 64), 2).apply({"params": params}, x) ** 2)

    g1, g2 = jax.grad(loss_fused)(params), jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_mlp_non_multiple_batch_and_deep_chain():
    # Batch not a multiple of the tile + a 3-hidden-layer chain.
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 9)
    dims = [5, 32, 48, 16, 3]
    wb = []
    for i in range(4):
        wb.append(jax.random.normal(ks[2 * i], (dims[i], dims[i + 1])) * 0.3)
        wb.append(jax.random.normal(ks[2 * i + 1], (dims[i + 1],)) * 0.1)
    x = jax.random.normal(ks[8], (1031, 5))
    out = _pallas_forward(x, tuple(wb))
    ref = _reference_forward(x, wb)
    assert out.shape == (1031, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_mlp_off_by_default():
    from pearl_tpu.ops.fused_mlp import use_fused_mlp

    assert use_fused_mlp() is False  # opt-in via PEARL_TPU_FUSED_MLP=1
