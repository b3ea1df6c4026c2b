"""Offline path: dataset round-trip, IQL/CQL offline training, evaluation."""

import numpy as np
import jax

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    DeepQLearning,
    ImplicitQLearning,
    TD3BC,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning
from pearl_tpu.training.offline import (
    get_offline_data_in_buffer,
    offline_evaluation,
    offline_learning,
    save_offline_data,
    transitions_from_arrays,
)


def _random_cartpole_dataset(n=256):
    rng = np.random.RandomState(0)
    return transitions_from_arrays(
        state=rng.randn(n, 4).astype(np.float32),
        action=rng.randint(0, 2, (n, 1)).astype(np.float32),
        reward=np.ones((n,), np.float32),
        next_state=rng.randn(n, 4).astype(np.float32),
        terminated=rng.rand(n) < 0.02,
    )


def test_dataset_roundtrip(tmp_path):
    batch = _random_cartpole_dataset()
    path = str(tmp_path / "data.npz")
    save_offline_data(path, batch)
    buffer, state = get_offline_data_in_buffer(path)
    assert int(state.size) == 256
    np.testing.assert_allclose(
        np.asarray(state.storage.reward), np.asarray(batch.reward)
    )


def test_offline_cql_then_eval(tmp_path):
    batch = _random_cartpole_dataset()
    path = str(tmp_path / "data.npz")
    save_offline_data(path, batch)
    buffer, buf_state = get_offline_data_in_buffer(path)

    env = CartPole()
    agent = PearlAgent(
        policy_learner=DeepQLearning(is_conservative=True, conservative_alpha=1.0)
    ).for_env(env)
    key = jax.random.PRNGKey(0)
    obs0 = np.zeros((1, 4), np.float32)
    astate = agent.init(key, 4, 1, obs0)
    logged = []
    astate = offline_learning(
        agent, astate, buffer, buf_state,
        number_of_batches=20, batch_size=32, log_every=10,
        logger=lambda m, i: logged.append((i, m)),
    )
    assert int(astate.learner.step) == 20
    assert len(logged) == 2
    returns = offline_evaluation(
        agent, astate, env, num_envs=4, max_steps=4 * 64
    )
    assert len(returns) > 0


def test_offline_iql_continuous():
    rng = np.random.RandomState(1)
    n = 128
    batch = transitions_from_arrays(
        state=rng.randn(n, 3).astype(np.float32),
        action=rng.uniform(-2, 2, (n, 1)).astype(np.float32),
        reward=-np.abs(rng.randn(n)).astype(np.float32),
        next_state=rng.randn(n, 3).astype(np.float32),
        terminated=np.zeros((n,), bool),
        action_index=np.zeros((n,), np.int32),
    )
    env = Pendulum()
    buffer = BasicReplayBuffer(capacity=n)
    example = jax.tree.map(lambda x: x[:1] if x is not None else None, batch)
    buf_state = buffer.push(buffer.init(example), batch)

    agent = PearlAgent(policy_learner=ImplicitQLearning()).for_env(env)
    astate = agent.init(jax.random.PRNGKey(0), 3, 1, np.zeros((1, 3), np.float32))
    astate = offline_learning(
        agent, astate, buffer, buf_state,
        number_of_batches=10, batch_size=32, log_every=10,
    )
    assert int(astate.learner.step) == 10
    assert np.isfinite(
        np.asarray(jax.tree.leaves(astate.learner.extra.value_params)[0])
    ).all()


def test_collect_offline_data(tmp_path):
    from pearl_tpu.training.collect import collect_offline_data
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning as DQL

    agent = PearlAgent(
        policy_learner=DQL(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=64),
    )
    path = str(tmp_path / "collected.npz")
    batch = collect_offline_data(
        agent, CartPole(), num_transitions=256, num_envs=8, save_path=path
    )
    assert batch.reward.shape[0] == 256
    buffer, state = get_offline_data_in_buffer(path)
    assert int(state.size) == 256


def test_reference_pt_dataset_format(tmp_path):
    """The reference's hosted datasets are torch-saved lists of transition
    dicts (offline_learning_and_evaluation.py:40-138); they load directly."""
    torch = __import__("torch")
    rng = np.random.RandomState(3)
    rows = [
        {
            "observation": torch.tensor(rng.randn(4), dtype=torch.float32),
            "action": torch.tensor(float(rng.randint(0, 2))),
            "reward": torch.tensor(1.0),
            "next_observation": torch.tensor(rng.randn(4), dtype=torch.float32),
            "terminated": torch.tensor(False),
            "truncated": torch.tensor(False),
        }
        for _ in range(32)
    ]
    path = str(tmp_path / "data.pt")
    torch.save(rows, path)
    buffer, state = get_offline_data_in_buffer(path)
    assert int(state.size) == 32
    assert state.storage.state.shape == (32, 4)
    assert state.storage.action.shape == (32, 1)
    assert bool(np.all(np.asarray(state.storage.reward) == 1.0))


def test_url_dataset_ingestion(tmp_path):
    """URL ingestion like the reference's hosted datasets
    (offline_learning_and_evaluation.py:40-138) — exercised via file:// here
    (no egress in CI); http(s) uses the same urllib path."""
    batch = _random_cartpole_dataset(64)
    path = str(tmp_path / "data.npz")
    save_offline_data(path, batch)
    buffer, state = get_offline_data_in_buffer("file://" + path)
    assert int(state.size) == 64
    np.testing.assert_allclose(
        np.asarray(state.storage.reward), np.asarray(batch.reward)
    )


def test_url_dataset_ingestion_no_egress_error():
    """Unreachable URLs fail with an actionable error, not a raw socket
    traceback (reference torch-loads hosted URLs; this container has no
    egress)."""
    import pytest

    from pearl_tpu.training.offline import get_offline_data_in_buffer

    with pytest.raises(RuntimeError, match="local path"):
        get_offline_data_in_buffer("file:///nonexistent/dir/data_123.npz")
