"""Data-parallel runner: learner replicas must stay synchronized under psum'd
gradients across the virtual CPU device mesh (SURVEY.md §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.parallel import DataParallelRunner, make_mesh
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_dp_runner_replicas_stay_in_sync():
    mesh = make_mesh()
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=256),
    )
    runner = DataParallelRunner(
        agent, CartPole(), mesh, num_envs_per_device=4, steps_per_learn=4
    )
    key = jax.random.PRNGKey(0)
    astate, env_states = runner.init(key)
    for i in range(2):
        key, k = jax.random.split(key)
        astate, env_states, reward = runner.step(astate, env_states, k)
    # Stacked learner params: leading axis = n_devices; all replicas equal.
    leaves = jax.tree.leaves(astate.learner.params)
    for leaf in leaves:
        arr = np.asarray(leaf)
        assert arr.shape[0] == runner.n_devices
        for d in range(1, runner.n_devices):
            np.testing.assert_allclose(arr[0], arr[d], rtol=1e-6, atol=1e-6)
    # Env shards must differ across devices (different keys).
    t = np.asarray(env_states.t)
    assert t.shape[0] == runner.n_devices
    # Learning actually happened.
    assert int(np.asarray(astate.learner.step)[0]) == 2
