"""HER buffer: relabeled transitions appear with achieved-goal rewards."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs.sparse_reward import DiscreteSparseRewardEnvironment
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.hindsight import HindsightExperienceReplayBuffer
from pearl_tpu.training import online_learning


def test_her_relabels_on_episode_end():
    num_envs = 4
    env = DiscreteSparseRewardEnvironment(max_steps=10, length=20.0, step_size=4.0)
    buffer = HindsightExperienceReplayBuffer(
        capacity=4096, num_envs=num_envs, max_episode_len=10, goal_dim=2
    )
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=buffer,
    )
    res = online_learning(
        agent, env, num_envs=num_envs, max_steps=num_envs * 64,
        learn_every_k_steps=8, learning_starts=64, seed=0,
    )
    state = res.agent_state.replay
    size = int(state.size)
    # With max_steps=10 episodes, 256 raw steps must have produced extra
    # relabeled transitions: size > raw transition count is not directly
    # observable (shared ring), but relabeled rows with reward 0 near the end
    # of episodes must exist.
    rewards = np.asarray(state.storage.reward)[:size]
    assert size > 256  # raw + relabeled
    assert (rewards == 0.0).sum() > 0  # relabeled terminal rewards present
    # Relabeled states carry the achieved goal: some transition must have
    # next_state position equal to its goal.
    ns = np.asarray(state.storage.next_state)[:size]
    pos, goal = ns[:, :2], ns[:, 2:]
    dist = np.linalg.norm(pos - goal, axis=-1)
    assert (dist < 4.0).sum() > 0
