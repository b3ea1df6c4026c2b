"""Contextual bandits: LinearRegression correctness vs closed form, LinUCB on
a synthetic linear env (ground-truth recovery), disjoint container, MAB
sanity, and exploration-module behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs.bandit import (
    LinearSyntheticBanditEnvironment,
    RewardIsTenTimesActionMABEnvironment,
)
from pearl_tpu.neural_networks.contextual_bandit import LinearRegression, append_ones
from pearl_tpu.policy_learners.contextual_bandits import (
    DisjointBanditContainer,
    LinearBandit,
    NeuralLinearBandit,
)
from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    SquareCBExploration,
    ThompsonSamplingExplorationLinear,
    UCBExploration,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def test_linear_regression_matches_closed_form():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 3).astype(np.float32)
    w_true = np.array([0.5, -1.0, 2.0, 0.3])  # [intercept, w...]
    y = (append_ones(jnp.asarray(X)) @ jnp.asarray(w_true)).astype(jnp.float32)
    weights = rng.uniform(0.5, 2.0, 200).astype(np.float32)

    lr = LinearRegression(feature_dim=3, l2_reg_lambda=0.0)
    state = lr.init()
    # Two partial updates must equal one big update (additivity).
    state = lr.update(state, jnp.asarray(X[:120]), y[:120], jnp.asarray(weights[:120]))
    state = lr.update(state, jnp.asarray(X[120:]), y[120:], jnp.asarray(weights[120:]))
    np.testing.assert_allclose(np.asarray(lr.coefs(state)), w_true, atol=1e-3)

    # sigma shrinks as data accumulates.
    x0 = jnp.asarray(X[:1])
    fresh_sigma = lr.calculate_sigma(lr.init(), x0)
    # Fresh state with lambda=0 is singular; use ridge for the comparison.
    lr_r = LinearRegression(feature_dim=3, l2_reg_lambda=1.0)
    s0 = lr_r.init()
    s1 = lr_r.update(s0, jnp.asarray(X), y, jnp.asarray(weights))
    assert float(lr_r.calculate_sigma(s1, x0)[0]) < float(lr_r.calculate_sigma(s0, x0)[0])


def test_linear_regression_thompson_sampling_spread():
    lr = LinearRegression(feature_dim=2)
    state = lr.init()
    samples = jnp.stack(
        [lr.sample_coefs(state, jax.random.PRNGKey(i)) for i in range(32)]
    )
    assert float(jnp.std(samples)) > 0.1  # prior uncertainty visible


def _run_bandit(learner, env, num_envs=16, steps=2048):
    agent = PearlAgent(
        policy_learner=learner,
        replay_buffer=BasicReplayBuffer(capacity=num_envs),
    )
    return online_learning(
        agent, env, num_envs=num_envs, max_steps=steps, learn_every_k_steps=1,
        seed=0,
    )


def test_linucb_learns_synthetic_linear_env():
    env = LinearSyntheticBanditEnvironment(seed=3)
    res = _run_bandit(
        LinearBandit(exploration=UCBExploration(alpha=1.0)), env, steps=4096
    )
    # Evaluate greedily: average reward should be near the best achievable.
    state = res.agent_state
    learner = LinearBandit(exploration=UCBExploration(alpha=1.0)).bind(env.action_space)
    key = jax.random.PRNGKey(42)
    contexts = jax.random.uniform(key, (256, env.observation_dim), minval=-1, maxval=1)
    _, choice = learner.act(state.learner, contexts, None, key, exploit=True)
    means = jax.vmap(env._mean_rewards)(contexts)
    chosen = jnp.take_along_axis(means, choice.index[:, None], axis=1)[:, 0]
    regret = jnp.mean(jnp.max(means, axis=1) - chosen)
    assert float(regret) < 0.1, float(regret)


def test_thompson_and_squarecb_smoke():
    env = LinearSyntheticBanditEnvironment(seed=1)
    for expl in (ThompsonSamplingExplorationLinear(), SquareCBExploration(gamma=50.0)):
        res = _run_bandit(LinearBandit(exploration=expl), env, steps=512)
        assert np.isfinite(np.asarray(res.agent_state.learner.model.A)).all()


def test_mab_ten_times_action():
    env = RewardIsTenTimesActionMABEnvironment(num_arms=4)
    res = _run_bandit(
        DisjointBanditContainer(exploration=UCBExploration(alpha=40.0)), env, steps=2048
    )
    learner = DisjointBanditContainer(exploration=UCBExploration(alpha=40.0)).bind(
        env.action_space
    )
    _, choice = learner.act(
        res.agent_state.learner,
        jnp.zeros((8, 1)),
        None,
        jax.random.PRNGKey(0),
        exploit=True,
    )
    assert np.all(np.asarray(choice.index) == 3)


def test_neural_linear_bandit_smoke():
    env = LinearSyntheticBanditEnvironment(seed=2)
    res = _run_bandit(
        NeuralLinearBandit(
            exploration=UCBExploration(alpha=1.0), training_rounds=1, batch_size=16
        ),
        env,
        steps=256,
    )
    sw = float(res.agent_state.learner.linreg.sum_weight)
    assert sw > 0
