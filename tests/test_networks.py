"""Unit tests for network variants not covered by the method matrix."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.neural_networks.actor_networks import (
    CNNActorNetwork,
    DynamicActionActorNetwork,
    GaussianActorNetwork,
    action_scaling,
    action_unscaling,
)
from pearl_tpu.neural_networks.q_value_networks import (
    MultiHeadQValueNetwork,
    TwoTowerQValueNetwork,
    VanillaQValueNetwork,
)
from pearl_tpu.neural_networks.value_networks import CNNValueNetwork
from pearl_tpu.neural_networks.twin_critic import TwinCritic


def _candidates(B, A, d):
    return jnp.broadcast_to(jnp.eye(A)[None, :, :d], (B, A, d))


def test_two_tower_q():
    net = TwoTowerQValueNetwork(
        state_hidden_dims=(16,), action_hidden_dims=(16,), hidden_dims=(16,),
        state_output_dim=8, action_output_dim=8,
    )
    params = net.init(jax.random.PRNGKey(0), 4, 2, 2)
    q = net.q_all(params, jnp.ones((3, 4)), _candidates(3, 2, 2))
    assert q.shape == (3, 2)
    assert np.isfinite(np.asarray(q)).all()


def test_multihead_q():
    net = MultiHeadQValueNetwork(hidden_dims=(16,))
    params = net.init(jax.random.PRNGKey(0), 4, 2, 3)
    q = net.q_all(params, jnp.ones((5, 4)), _candidates(5, 3, 3))
    assert q.shape == (5, 3)


def test_dynamic_action_actor_masking():
    net = DynamicActionActorNetwork(hidden_dims=(16,))
    params = net.init(jax.random.PRNGKey(0), 4, 3, 5)
    actions = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3))
    mask = jnp.array([[True, True, False, False, False]] * 2)
    probs = net.get_policy_distribution(params, jnp.ones((2, 4)), actions, mask)
    np.testing.assert_allclose(np.asarray(probs[:, 2:]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_gaussian_actor_log_prob_consistency():
    net = GaussianActorNetwork(hidden_dims=(16, 16))
    low, high = -2.0 * jnp.ones(2), 2.0 * jnp.ones(2)
    params = net.init(jax.random.PRNGKey(0), 3, 2)
    state = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    action, logp = net.sample_action(params, state, jax.random.PRNGKey(2), low, high)
    assert np.all(np.asarray(action) >= -2.0) and np.all(np.asarray(action) <= 2.0)
    # get_log_probability of the sampled action must match the sampling logp.
    logp2 = net.get_log_probability(params, state, action, low, high)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2), atol=1e-2)


def test_action_scaling_roundtrip():
    low, high = jnp.array([-1.0, 0.0]), jnp.array([3.0, 10.0])
    x = jnp.array([[0.5, -0.25]])
    np.testing.assert_allclose(
        np.asarray(action_unscaling(low, high, action_scaling(low, high, x))),
        np.asarray(x),
        rtol=1e-6,
    )


def test_cnn_actor_and_value():
    shape = (8, 8, 2)
    actor = CNNActorNetwork(
        input_shape=shape, out_channels=(4,), kernel_sizes=(3,), strides=(1,),
        paddings=(1,), hidden_dims=(16,),
    )
    params = actor.init(jax.random.PRNGKey(0), 128, 3, 3)
    states = jnp.ones((2, 8 * 8 * 2))
    probs = actor.get_policy_distribution(params, states, _candidates(2, 3, 3))
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    vnet = CNNValueNetwork(
        input_shape=shape, out_channels=(4,), kernel_sizes=(3,), strides=(1,),
        paddings=(1,), hidden_dims=(16,),
    )
    vparams = vnet.init(jax.random.PRNGKey(1), 128)
    v = vnet.value(vparams, states)
    assert v.shape == (2,)


def test_twin_critic_heads_differ():
    tc = TwinCritic(hidden_dims=(16,))
    params = tc.init(jax.random.PRNGKey(0), 3, 2)
    s, a = jnp.ones((4, 3)), jnp.ones((4, 2))
    q1, q2 = tc.q_both(params, s, a)
    assert q1.shape == (4,)
    assert not np.allclose(np.asarray(q1), np.asarray(q2))  # independent inits
    np.testing.assert_allclose(
        np.asarray(tc.q_min(params, s, a)),
        np.minimum(np.asarray(q1), np.asarray(q2)),
        rtol=1e-6,
    )
