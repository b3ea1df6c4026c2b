"""Ensemble-axis model parallelism (parallel/ensemble_parallel.py).

The K Q-ensemble members are sharded over a `model` mesh axis with pure
sharding annotations; results must match the unsharded learn_batch exactly
(GSPMD only re-partitions independent per-member work)."""

import jax
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.neural_networks.q_value_networks import EnsembleQValueNetwork
from pearl_tpu.parallel.ensemble_parallel import (
    make_2d_mesh,
    make_ensemble_sharded_learn_batch,
)
from pearl_tpu.policy_learners.sequential_decision_making import BootstrappedDQN
from pearl_tpu.replay_buffers.bootstrap import BootstrapReplayBuffer
from pearl_tpu.training import online_learning


def test_ensemble_sharded_learn_matches_unsharded():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    K = 4
    agent = PearlAgent(
        policy_learner=BootstrappedDQN(
            q_network=EnsembleQValueNetwork(ensemble_size=K, hidden_dims=(32,)),
            training_rounds=1,
            batch_size=16,
        ),
        replay_buffer=BootstrapReplayBuffer(capacity=512, ensemble_size=K),
    )
    res = online_learning(
        agent, CartPole(), num_envs=8, max_steps=256, learn_every_k_steps=8,
        learning_starts=64, seed=0,
    )
    bound = agent.for_env(CartPole())
    batch = bound.replay_buffer.sample(res.agent_state.replay, jax.random.PRNGKey(1), 16)
    state = res.agent_state.learner

    ref_state, ref_metrics = bound.policy_learner.learn_batch(state, batch)

    mesh = make_2d_mesh(1, 2)
    sharded_fn = make_ensemble_sharded_learn_batch(bound, mesh)
    sh_state, sh_metrics = sharded_fn(state, batch)

    # Member params land partitioned over the model axis...
    leaf = jax.tree.leaves(sh_state.params)[0]
    assert len(leaf.sharding.device_set) == 2
    # ...and the math is unchanged.
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_ensemble_sharding_rejects_indivisible():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    agent = PearlAgent(
        policy_learner=BootstrappedDQN(
            q_network=EnsembleQValueNetwork(ensemble_size=3, hidden_dims=(16,)),
        ),
        replay_buffer=BootstrapReplayBuffer(capacity=64, ensemble_size=3),
    ).for_env(CartPole())
    with pytest.raises(ValueError, match="must divide"):
        make_ensemble_sharded_learn_batch(agent, make_2d_mesh(1, 2))
