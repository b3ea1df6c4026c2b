"""Checkpointing, tabular Q, gym adapter, epistemic nets, benchmark registry,
CB benchmark driver, compare()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.benchmarks.cb import run_bandit_benchmark
from pearl_tpu.benchmarks.configs import METHODS
from pearl_tpu.benchmarks.run import run_single
from pearl_tpu.envs import CartPole, FrozenLake, LinearSyntheticBanditEnvironment
from pearl_tpu.neural_networks.epistemic import Epinet, MLPWithPrior
from pearl_tpu.policy_learners.contextual_bandits import LinearBandit
from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    UCBExploration,
)
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.policy_learners.sequential_decision_making.tabular_q import (
    DictTabularQLearning,
    TabularQLearning,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning
from pearl_tpu.utils import compare, tree_allclose
from pearl_tpu.utils.checkpoint import restore, save


def test_checkpoint_roundtrip(tmp_path):
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=128),
    )
    res = online_learning(
        agent, CartPole(), num_envs=4, max_steps=64, learn_every_k_steps=8,
        learning_starts=16, seed=0,
    )
    path = str(tmp_path / "ckpt")
    save(path, res.agent_state)
    fresh = online_learning(
        agent, CartPole(), num_envs=4, max_steps=32, learn_every_k_steps=8,
        learning_starts=16, seed=1,
    ).agent_state
    restored = restore(path, fresh)
    assert tree_allclose(restored.learner.params, res.agent_state.learner.params)
    assert compare(restored.learner.params, res.agent_state.learner.params) == ""
    assert compare(restored.learner.params, fresh.learner.params) != ""


def test_tabular_q_frozen_lake_nonslippery():
    env = FrozenLake(slippery=False)
    from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration

    agent = PearlAgent(
        policy_learner=TabularQLearning(
            learning_rate=0.5, exploration=EGreedyExploration(epsilon=0.3)
        ),
        replay_buffer=BasicReplayBuffer(capacity=8),
    )
    res = online_learning(
        agent, env, num_envs=8, max_steps=8 * 2000, learn_every_k_steps=1, seed=0,
    )
    # Greedy policy from the learned table must reach the goal.
    q = np.asarray(res.agent_state.learner.q_table)
    state, obs = env.reset(jax.random.PRNGKey(0))
    total = 0.0
    for _ in range(20):
        a = int(np.argmax(q[int(np.argmax(np.asarray(obs)))]))
        state, result = env.step(state, jnp.array([a], jnp.float32), jax.random.PRNGKey(0))
        obs = result.observation
        total += float(result.reward)
        if bool(result.done):
            break
    assert total == 1.0


def test_dict_tabular_q_host():
    learner = DictTabularQLearning(learning_rate=1.0, exploration_rate=0.0)
    # Two-state chain: action 1 in state 0 gives reward 1.
    for _ in range(10):
        learner.learn(0, 1, 1.0, 1, True, num_actions=2)
        learner.learn(0, 0, 0.0, 1, True, num_actions=2)
    assert learner.act(0, num_actions=2, exploit=True) == 1


def test_gym_adapter_cartpole_parity():
    pytest.importorskip("gymnasium")
    from pearl_tpu.envs.gym_adapter import GymEnvironment

    env = GymEnvironment("CartPole-v1")
    assert env.action_space.n == 2
    _, obs = env.reset(seed=0)
    assert obs.shape == (4,)
    _, result = env.step(None, jnp.array([1.0]))
    assert result.observation.shape == (4,)
    assert float(result.reward) == 1.0
    env.close()


def test_epistemic_nets():
    mp = MLPWithPrior(hidden_dims=(16,), output_dim=2, prior_scale=0.5)
    params = mp.init(jax.random.PRNGKey(0), 3)
    out = mp.apply(params, jnp.ones((4, 3)))
    assert out.shape == (4, 2)
    # Prior contributes: zeroing it changes the output.
    zero_prior = {**params, "prior": jax.tree.map(jnp.zeros_like, params["prior"])}
    assert not np.allclose(np.asarray(mp.apply(zero_prior, jnp.ones((4, 3)))), np.asarray(out))

    ep = Epinet(index_dim=4, output_dim=1)
    eparams = ep.init(jax.random.PRNGKey(1), 5)
    z = ep.sample_index(jax.random.PRNGKey(2))
    out = ep.apply(eparams, jnp.ones((3, 5)), z)
    assert out.shape == (3, 1)
    z2 = ep.sample_index(jax.random.PRNGKey(3))
    out2 = ep.apply(eparams, jnp.ones((3, 5)), z2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))  # epistemic variation


def test_benchmark_registry_builds_all():
    for name, method in METHODS.items():
        agent = method.make_agent(4)
        assert agent.policy_learner is not None, name


def test_benchmark_run_single_quick():
    curve = run_single(
        METHODS["DQN"], CartPole(), num_envs=4, max_steps=512, record_period=256, seed=0
    )
    assert curve.shape == (2,)
    assert np.isfinite(curve).any()


def test_cb_benchmark_regret_decreases():
    env = LinearSyntheticBanditEnvironment(seed=0)
    agent = PearlAgent(
        policy_learner=LinearBandit(exploration=UCBExploration(alpha=1.0)),
        replay_buffer=BasicReplayBuffer(capacity=8),
    )
    out = run_bandit_benchmark(agent, env, num_envs=8, steps=400, seed=0)
    assert out["regret"].shape == (400,)
    # Late regret lower than early regret.
    assert out["regret"][-100:].mean() < out["regret"][:100].mean()


def test_host_loop_dict_tabular_on_gym_frozenlake():
    pytest.importorskip("gymnasium")
    from pearl_tpu.envs.gym_adapter import GymEnvironment
    from pearl_tpu.training.host_loop import online_learning_host

    env = GymEnvironment("FrozenLake-v1", render_mode=None)
    learner = DictTabularQLearning(
        learning_rate=0.5, discount_factor=0.9, exploration_rate=0.3, seed=0
    )
    returns = online_learning_host(env, learner, number_of_episodes=150, seed=0)
    # Slippery FrozenLake is hard; the learner must at least reach the goal
    # sometimes and build a nonempty table.
    assert sum(returns) > 0
    assert len(learner.q_values) > 0
    env.close()
