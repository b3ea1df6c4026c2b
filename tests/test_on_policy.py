"""On-policy path: GAE/returns math + PPO/REINFORCE smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.sequential_decision_making import (
    ProximalPolicyOptimization,
    REINFORCE,
)
from pearl_tpu.policy_learners.sequential_decision_making.ppo import (
    gae_lambda_returns,
)
from pearl_tpu.policy_learners.sequential_decision_making.reinforce import (
    discounted_returns,
)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer
from pearl_tpu.training import online_learning


def test_discounted_returns_single_episode():
    # One env, 3 steps, terminal at t=2, gamma=0.5, rewards 1 everywhere.
    rewards = jnp.ones((3, 1))
    next_values = jnp.zeros((3, 1))
    terminated = jnp.array([[False], [False], [True]])
    done = terminated
    g = discounted_returns(rewards, next_values, terminated, done, 0.5)
    # G2 = 1; G1 = 1 + 0.5*1 = 1.5; G0 = 1 + 0.5*1.5 = 1.75
    np.testing.assert_allclose(np.asarray(g)[:, 0], [1.75, 1.5, 1.0], rtol=1e-6)


def test_discounted_returns_truncation_bootstraps_value():
    rewards = jnp.ones((2, 1))
    next_values = jnp.array([[0.0], [10.0]])
    terminated = jnp.zeros((2, 1), bool)
    done = jnp.array([[False], [True]])  # truncated at the end
    g = discounted_returns(rewards, next_values, terminated, done, 0.5)
    # G1 = 1 + 0.5*10 = 6; G0 = 1 + 0.5*6 = 4
    np.testing.assert_allclose(np.asarray(g)[:, 0], [4.0, 6.0], rtol=1e-6)


def test_gae_matches_mc_when_lambda_1():
    # With lam=1 and V=0, advantages are the discounted returns.
    T, B = 5, 2
    key = jax.random.PRNGKey(0)
    rewards = jax.random.uniform(key, (T, B))
    zeros = jnp.zeros((T, B))
    terminated = jnp.zeros((T, B), bool).at[-1].set(True)
    adv, lam_ret = gae_lambda_returns(
        rewards, zeros, zeros, terminated, terminated, 0.9, 1.0
    )
    expect = discounted_returns(rewards, zeros, terminated, terminated, 0.9)
    np.testing.assert_allclose(np.asarray(adv), np.asarray(expect), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lam_ret), np.asarray(adv), rtol=1e-5)


def _run_on_policy(learner, num_envs=4, rollout=16, chunks=3):
    buf = OnPolicyReplayBuffer(capacity=rollout * num_envs, num_envs=num_envs)
    agent = PearlAgent(policy_learner=learner, replay_buffer=buf)
    return online_learning(
        agent, CartPole(), num_envs=num_envs, max_steps=rollout * num_envs * chunks,
        learn_every_k_steps=rollout, seed=0,
    )


def test_ppo_smoke():
    res = _run_on_policy(ProximalPolicyOptimization(training_rounds=2, batch_size=32))
    assert int(res.agent_state.learner.step) == 3 * 2
    # Buffer cleared after each on-policy learn.
    assert int(res.agent_state.replay.size) == 0


def test_reinforce_smoke():
    res = _run_on_policy(REINFORCE())
    assert int(res.agent_state.learner.step) == 3
    assert int(res.agent_state.replay.size) == 0
