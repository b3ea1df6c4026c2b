"""Prioritized replay: sampling concentrates on high-priority transitions and
the learner writes back TD-error priorities."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.prioritized import PrioritizedReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.training import online_learning


def _batch(n, reward=0.0):
    return TransitionBatch(
        state=jnp.zeros((n, 2)),
        action=jnp.zeros((n, 1)),
        reward=jnp.full((n,), reward),
        next_state=jnp.zeros((n, 2)),
        terminated=jnp.zeros((n,), bool),
        truncated=jnp.zeros((n,), bool),
        action_index=jnp.zeros((n,), jnp.int32),
    )


def test_sampling_follows_priorities():
    buf = PrioritizedReplayBuffer(capacity=8, alpha=1.0, beta=0.0)
    state = buf.init(_batch(1))
    state = buf.push(state, _batch(8))
    # Slot 3 gets a huge priority.
    state = buf.update_priorities(state, jnp.array([3]), jnp.array([100.0]))
    state = state.replace(
        priorities=state.priorities.at[jnp.arange(8) != 3].set(1e-3)
    )
    batch = buf.sample(state, jax.random.PRNGKey(0), 256)
    # With alpha=1 slot 3 dominates; its reward marker confirms identity.
    state2 = state.replace(
        storage=state.storage.replace(reward=jnp.arange(8.0))
    )
    b2 = buf.sample(state2, jax.random.PRNGKey(1), 256)
    assert (np.asarray(b2.reward) == 3.0).mean() > 0.95
    # Importance weights present.
    assert batch.weight is not None


def test_dqn_with_prioritized_replay_end_to_end():
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=2, batch_size=32),
        replay_buffer=PrioritizedReplayBuffer(capacity=1024),
    )
    res = online_learning(
        agent, CartPole(), num_envs=4, max_steps=256, learn_every_k_steps=8,
        learning_starts=64, seed=0,
    )
    replay = res.agent_state.replay
    p = np.asarray(replay.priorities)[: int(replay.size)]
    # Priorities were written back with TD magnitudes (not all still at the
    # max-priority init value of 1.0).
    assert np.isfinite(p).all()
    assert (np.abs(p - 1.0) > 1e-6).sum() > 0
    assert int(res.agent_state.learner.step) > 0
