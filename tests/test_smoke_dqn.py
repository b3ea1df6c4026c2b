"""End-to-end smoke: DQN + epsilon-greedy + ring replay on vectorized CartPole."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def test_dqn_cartpole_smoke():
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=1000),
    )
    result = online_learning(
        agent,
        CartPole(),
        num_envs=8,
        max_steps=8 * 64,
        learn_every_k_steps=8,
        learning_starts=128,
        seed=0,
    )
    assert result.total_steps >= 8 * 64
    # Episodes should have finished and returns be positive.
    assert len(result.episode_returns) > 0
    assert np.all(result.episode_returns > 0)
    # Learner state advanced.
    assert int(result.agent_state.learner.step) > 0
