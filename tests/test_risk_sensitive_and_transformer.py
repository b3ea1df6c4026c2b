"""Risk-sensitive QR-DQN on the mean-variance bandit + transformer summarizer."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import MeanVarBanditEnvironment
from pearl_tpu.history_summarization_modules import TransformerHistorySummarization
from pearl_tpu.policy_learners.sequential_decision_making import (
    QuantileRegressionDeepQLearning,
)
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.safety_modules import (
    QuantileNetworkMeanVarianceSafetyModule,
    RiskNeutralSafetyModule,
)
from pearl_tpu.training import online_learning


def _train_qrdqn(safety, steps=3000):
    env = MeanVarBanditEnvironment()
    # The risk module is passed at the AGENT level; PearlAgent.__post_init__
    # injects it into the distributional learner (reference
    # pearl_agent.py:97), so QR-DQN's acting/learning sees it.
    agent = PearlAgent(
        policy_learner=QuantileRegressionDeepQLearning(
            training_rounds=2,
            batch_size=64,
            exploration=EGreedyExploration(epsilon=0.3),
            discount_factor=0.0,  # bandit: single-step episodes
        ),
        replay_buffer=BasicReplayBuffer(capacity=2048),
        safety_module=safety,
    )
    assert agent.policy_learner.safety is safety  # injection happened
    res = online_learning(
        agent, env, num_envs=8, max_steps=steps * 8, learn_every_k_steps=2,
        learning_starts=256, seed=0,
    )
    learner = agent.for_env(env).policy_learner
    _, choice = learner.act(
        res.agent_state.learner, jnp.zeros((16, 1)), None,
        jax.random.PRNGKey(0), exploit=True,
    )
    return np.asarray(choice.index)


def test_risk_neutral_prefers_risky_arm():
    idx = _train_qrdqn(RiskNeutralSafetyModule())
    assert (idx == 1).mean() > 0.9  # higher mean wins


def test_mean_variance_prefers_safe_arm():
    idx = _train_qrdqn(
        QuantileNetworkMeanVarianceSafetyModule(variance_weighting_coefficient=0.5)
    )
    assert (idx == 0).mean() > 0.9  # variance penalty flips the choice


def test_transformer_summarizer_trains():
    from pearl_tpu.envs import CartPole, PartialObservabilityWrapper
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning

    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=1,
            batch_size=16,
            history_summarizer=TransformerHistorySummarization(
                history_length=4, dim=16, num_layers=1, num_heads=2
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=256),
    )
    res = online_learning(
        agent, env, num_envs=4, max_steps=128, learn_every_k_steps=8,
        learning_starts=32, seed=0,
    )
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    leaves = jax.tree.leaves(ls.summarizer_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_transformer_sinusoidal_positional_encoding():
    """The sinusoidal option (reference
    transformer_history_summarization_module.py:78-150): fixed sin/cos
    encodings — no pos_embedding parameter, same output shape, finite
    training, and the PE matrix matches the textbook formula."""
    import jax.numpy as jnp

    from pearl_tpu.envs import CartPole, PartialObservabilityWrapper
    from pearl_tpu.history_summarization_modules.modules import (
        _sinusoidal_positions,
    )
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning

    pe = np.asarray(_sinusoidal_positions(8, 16)[0])
    assert pe.shape == (8, 16)
    np.testing.assert_allclose(pe[3, 0], np.sin(3.0), atol=1e-6)
    np.testing.assert_allclose(pe[3, 1], np.cos(3.0), atol=1e-6)
    np.testing.assert_allclose(
        pe[5, 2], np.sin(5.0 / 10000 ** (2 / 16)), atol=1e-6
    )

    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    for enc, has_pos in (("sinusoidal", False), ("learned", True)):
        summ = TransformerHistorySummarization(
            history_length=4, dim=16, num_layers=1, num_heads=2,
            positional_encoding=enc,
        )
        params = summ.init_params(jax.random.PRNGKey(0), 2, 2)
        assert ("pos_embedding" in params) == has_pos, enc
        out = summ.forward(params, jnp.zeros((3, 4 * 4)))
        assert out.shape == (3, 16)
        agent = PearlAgent(
            policy_learner=DeepQLearning(
                training_rounds=1, batch_size=16, history_summarizer=summ
            ),
            replay_buffer=BasicReplayBuffer(capacity=256),
        )
        res = online_learning(
            agent, env, num_envs=4, max_steps=128, learn_every_k_steps=8,
            learning_starts=32, seed=0,
        )
        leaves = jax.tree.leaves(res.agent_state.learner.summarizer_params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    import pytest

    with pytest.raises(ValueError, match="positional_encoding"):
        TransformerHistorySummarization(positional_encoding="bogus").init_params(
            jax.random.PRNGKey(0), 2, 2
        )


def test_transformer_dqn_learns_partial_obs_cartpole():
    """Learning-signal twin of the LSTM test
    (test_wrappers_and_history.py::test_lstm_dqn_learns_partial_obs_cartpole):
    positions-only CartPole (velocities hidden, reference
    wrappers/partial_observability.py) — the causal transformer over the
    8-step window must recover velocity for the agent to balance.
    Observed 14.7 -> 390.5 mean return in 300k steps at seed 7."""
    from pearl_tpu.envs import CartPole, PartialObservabilityWrapper
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning

    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
            history_summarizer=TransformerHistorySummarization(
                history_length=8, dim=64, num_layers=1, num_heads=4
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=50_048),
    )
    res = online_learning(
        agent, env, num_envs=32, max_steps=300_000,
        learn_every_k_steps=4, learning_starts=2_000, seed=7,
    )
    r = np.asarray(res.episode_returns)
    n = max(len(r) // 10, 20)
    assert r[-n:].mean() > 100.0, (r[:n].mean(), r[-n:].mean())
