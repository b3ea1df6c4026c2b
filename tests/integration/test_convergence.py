"""Convergence tests at the REFERENCE's own integration targets
(test/integration/test_integration.py; recorded in BASELINE.md):

- DQN reaches return 500 on CartPole (reference budget <= 1000 episodes)
- PPO reaches return 500 on CartPole (reference budget <= 1000 episodes)
- Continuous SAC reaches return -250 on Pendulum (reference budget <= 1500
  episodes = 300k steps)

Hyperparameters mirror the reference tests (hidden (64,64), batch sizes,
learning rates); budgets are expressed in env steps. Measured wall times on
this 2-core CPU container: ~17s (DQN), ~25s (PPO), ~33s (SAC) — vs ~1.5-10
min for the reference's step-at-a-time loop on the same machine
(docs/PARITY.md)."""

import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
    DeepQLearning,
    ProximalPolicyOptimization,
)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def _assert_reached(res, target):
    assert res.reached_target, (
        f"last-20 mean return {np.mean(res.episode_returns[-20:]):.1f} "
        f"did not reach {target} within {res.total_steps} env steps"
    )


def test_dqn_reaches_cartpole_500():
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=4,
            batch_size=128,
            exploration=EGreedyExploration(epsilon=0.05),
        ),
        replay_buffer=BasicReplayBuffer(capacity=10_000),
    )
    res = online_learning(
        agent, CartPole(), num_envs=16, max_steps=250_000, learn_every_k_steps=2,
        learning_starts=500, seed=42, target_return=500.0, target_window=20,
    )
    _assert_reached(res, 500.0)


def test_ppo_reaches_cartpole_500():
    num_envs, rollout = 16, 16
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            training_rounds=20, batch_size=64, epsilon=0.1,
            actor_learning_rate=1e-4, critic_learning_rate=1e-4,
        ),
        replay_buffer=OnPolicyReplayBuffer(
            capacity=rollout * num_envs, num_envs=num_envs
        ),
    )
    res = online_learning(
        agent, CartPole(), num_envs=num_envs, max_steps=400_000,
        learn_every_k_steps=rollout, seed=42, target_return=500.0, target_window=20,
    )
    _assert_reached(res, 500.0)


def test_continuous_sac_reaches_pendulum_minus_250():
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        ),
        replay_buffer=BasicReplayBuffer(capacity=100_000),
    )
    res = online_learning(
        agent, Pendulum(), num_envs=16, max_steps=300_000, learn_every_k_steps=1,
        learning_starts=1_000, seed=42, target_return=-250.0, target_window=20,
    )
    _assert_reached(res, -250.0)
