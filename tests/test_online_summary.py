"""Summary-stats mode of the online driver: device-side episode accounting
(training/online.py `stats="summary"`). Must preserve the RNG stream (and so
the learned parameters) of full mode exactly, and keep early stopping live."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def _agent(capacity=4096):
    return PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=64),
        replay_buffer=BasicReplayBuffer(capacity=capacity),
    )


def test_summary_mode_matches_full_mode_learner_state():
    """Same seed, same chunking -> bitwise-identical learner params in both
    stats modes (the summary accounting only adds reductions, never consumes
    RNG or reorders the program)."""
    kwargs = dict(
        num_envs=8,
        max_steps=8 * 4 * 6,
        learn_every_k_steps=4,
        chunks_per_dispatch=2,
        seed=11,
    )
    full = online_learning(_agent(), CartPole(), stats="full", **kwargs)
    summ = online_learning(_agent(), CartPole(), stats="summary", **kwargs)
    for a, b in zip(
        jax.tree.leaves(full.agent_state.learner.params),
        jax.tree.leaves(summ.agent_state.learner.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_summary_mode_counts_match_full_mode():
    kwargs = dict(
        num_envs=8, max_steps=8 * 2 * 40, learn_every_k_steps=2, seed=3
    )
    full = online_learning(_agent(), CartPole(), stats="full", **kwargs)
    summ = online_learning(_agent(), CartPole(), stats="summary", **kwargs)
    assert summ.total_episodes == len(full.episode_returns) > 0
    assert np.isclose(
        summ.mean_return, np.mean(full.episode_returns), rtol=1e-5
    )
    assert len(summ.return_curve) > 0


def test_summary_mode_early_stops_on_target():
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
        agent,
        CartPole(),
        num_envs=32,
        max_steps=120_000,
        learn_every_k_steps=4,
        chunks_per_dispatch=4,
        learning_starts=2_000,
        seed=7,
        target_return=100.0,
        stats="summary",
    )
    assert res.reached_target
    assert res.total_steps < 120_000
    assert res.return_curve[-1] >= 50.0  # curve tracks the statistic


def test_summary_mode_reports_cost_and_risky_means():
    from pearl_tpu.envs import SafetyWrapper

    env = SafetyWrapper(CartPole(), risky_fn=lambda obs, a: obs[0] > 0.0)
    res = online_learning(
        _agent(), env, num_envs=8, max_steps=8 * 2 * 40, learn_every_k_steps=2,
        seed=3, stats="summary",
    )
    assert res.total_episodes > 0
    assert res.mean_cost > 0.0  # right-of-center steps carry cost
    assert 0.0 < res.mean_risky_ratio < 1.0
