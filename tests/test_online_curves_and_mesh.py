"""stats="curves" (bounded device-side episode ring) and the mesh-aware
`online_learning` driver (VERDICT r2 items 2-4).

Curves mode must reproduce full mode's per-episode returns exactly at the
same seed (same RNG stream, same finish order); the mesh driver must keep
learner replicas bit-identical while every driver feature (summary stats,
early stopping, curves) stays live — including the sharding edge cases the
round-2 dryrun never compiled: PPO's learn-then-clear, the LSTM per-env
carry, SAC's alpha autotune, and the RC safety module's lambda.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.parallel import make_mesh, reshard_agent_state
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
    DeepQLearning,
    ProximalPolicyOptimization,
)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def _dqn_agent(capacity=512, batch_size=32):
    return PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=batch_size),
        replay_buffer=BasicReplayBuffer(capacity=capacity),
    )


def _replica_spread(stacked_learner_state) -> float:
    """Max over leaves of max |leaf - leaf[0]| — 0.0 iff replicas are
    bit-identical."""
    spreads = [
        float(jnp.max(jnp.abs(x - x[0])))
        for x in jax.tree.leaves(stacked_learner_state)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 1
    ]
    return max(spreads) if spreads else 0.0


# --------------------------------------------------------------------- curves


def test_curves_equals_full_same_seed():
    kwargs = dict(
        num_envs=8, max_steps=4096, learn_every_k_steps=4,
        chunks_per_dispatch=4, seed=3,
    )
    full = online_learning(_dqn_agent(), CartPole(), stats="full", **kwargs)
    curv = online_learning(
        _dqn_agent(), CartPole(), stats="curves", curve_capacity=2048, **kwargs
    )
    assert curv.episodes_dropped == 0
    assert len(curv.episode_returns) == len(full.episode_returns) > 0
    np.testing.assert_array_equal(curv.episode_returns, full.episode_returns)
    np.testing.assert_array_equal(curv.episode_costs, full.episode_costs)
    np.testing.assert_allclose(
        curv.episode_risky_ratios, full.episode_risky_ratios, atol=1e-6
    )
    assert curv.total_episodes == len(full.episode_returns)


def test_curves_ring_overflow_keeps_most_recent():
    # One dispatch, ring far smaller than the episodes it finishes: the drain
    # must yield the LAST `capacity` episodes and count the rest as dropped.
    kwargs = dict(
        num_envs=16, max_steps=16 * 64, learn_every_k_steps=64,
        chunks_per_dispatch=1, seed=5,
    )
    full = online_learning(_dqn_agent(), CartPole(), stats="full", **kwargs)
    n_full = len(full.episode_returns)
    R = 8
    assert n_full > R
    curv = online_learning(
        _dqn_agent(), CartPole(), stats="curves", curve_capacity=R, **kwargs
    )
    assert curv.episodes_dropped == n_full - R
    assert curv.total_episodes == n_full
    np.testing.assert_array_equal(
        curv.episode_returns, full.episode_returns[-R:]
    )


def test_curves_early_stopping():
    res = online_learning(
        _dqn_agent(), CartPole(), num_envs=8, max_steps=200_000,
        learn_every_k_steps=4, seed=0, stats="curves",
        target_return=12.0, target_window=10,
    )
    assert res.reached_target
    assert res.total_steps < 200_000
    assert np.mean(res.episode_returns[-10:]) >= 12.0


def test_deferred_push_identical_learning():
    """Chunk-granular ring writes are bit-identical to per-step pushes when
    capacity % (steps_per_chunk * num_envs) == 0 (same layout, same RNG)."""
    kwargs = dict(
        num_envs=8, max_steps=2048, learn_every_k_steps=4,
        chunks_per_dispatch=2, seed=7,
    )
    a = online_learning(
        _dqn_agent(capacity=256), CartPole(), **kwargs
    )
    b = online_learning(
        _dqn_agent(capacity=256), CartPole(), deferred_push=True, **kwargs
    )
    np.testing.assert_array_equal(a.episode_returns, b.episode_returns)
    for x, y in zip(
        jax.tree.leaves(a.agent_state.learner.params),
        jax.tree.leaves(b.agent_state.learner.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_deferred_push_rejected_for_stepwise_buffers():
    from pearl_tpu.replay_buffers.sarsa import SARSAReplayBuffer

    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=SARSAReplayBuffer(capacity=256, num_envs=4),
    )
    with pytest.raises(ValueError, match="deferred"):
        online_learning(
            agent, CartPole(), num_envs=4, max_steps=64, deferred_push=True
        )


def test_bad_stats_mode_raises():
    with pytest.raises(ValueError, match="stats"):
        online_learning(_dqn_agent(), CartPole(), stats="bogus")


# ----------------------------------------------------------------------- mesh


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    return make_mesh(2)


def test_mesh_driver_summary_early_stop_and_replica_sync(mesh2):
    agent = _dqn_agent()
    res = online_learning(
        agent, CartPole(), num_envs=8, max_steps=300_000,
        learn_every_k_steps=4, chunks_per_dispatch=2, seed=0,
        stats="summary", target_return=12.0, target_window=4,
        mesh=mesh2,
    )
    assert res.reached_target
    assert res.total_steps < 300_000
    assert res.total_episodes > 0
    # Learner replicas bit-identical after many pmean'd updates.
    assert _replica_spread(res.agent_state.learner.params) == 0.0
    # Replay shards are device-local (cursor identical, contents differ).
    stored = np.asarray(res.agent_state.replay.storage.state)
    assert stored.shape[0] == 2
    assert not np.array_equal(stored[0], stored[1])


def test_mesh_num_envs_must_divide(mesh2):
    with pytest.raises(ValueError, match="divide"):
        online_learning(_dqn_agent(), CartPole(), num_envs=7, mesh=mesh2)


def test_mesh_curves_mode(mesh2):
    res = online_learning(
        _dqn_agent(), CartPole(), num_envs=8, max_steps=8192,
        learn_every_k_steps=4, chunks_per_dispatch=2, seed=1,
        stats="curves", curve_capacity=1024, mesh=mesh2,
    )
    assert res.episodes_dropped == 0
    assert len(res.episode_returns) > 0
    assert res.total_episodes == len(res.episode_returns)
    # CartPole episode returns are positive integers (reward 1/step).
    assert (res.episode_returns >= 1.0).all()


def test_mesh_ppo_learn_then_clear(mesh2):
    # On-policy under shard_map: fixed rollout per device, agent-level buffer
    # clear after each learn. Replay config is per-device (2 envs/device).
    envs_per_dev, rollout = 2, 8
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(training_rounds=1, batch_size=16),
        replay_buffer=OnPolicyReplayBuffer(
            capacity=rollout * envs_per_dev, num_envs=envs_per_dev
        ),
    )
    res = online_learning(
        agent, CartPole(), num_envs=4, max_steps=4 * rollout * 4,
        learn_every_k_steps=rollout, seed=0, stats="summary", mesh=mesh2,
    )
    # Buffer was cleared after the final learn (on-policy semantics survive
    # the mesh), and actor/critic replicas stayed in sync.
    assert int(np.asarray(res.agent_state.replay.size)[0]) == 0
    assert _replica_spread(res.agent_state.learner.actor_params) == 0.0
    assert _replica_spread(res.agent_state.learner.critic_params) == 0.0


def test_mesh_lstm_summarizer_carry(mesh2):
    from pearl_tpu.history_summarization_modules import LSTMHistorySummarization

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=1, batch_size=16,
            history_summarizer=LSTMHistorySummarization(
                history_length=4, hidden_dim=16
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=256),
    )
    res = online_learning(
        agent, CartPole(), num_envs=4, max_steps=512,
        learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
    )
    # Per-env LSTM windows are device-local: (n_dev, envs_per_dev, T, F).
    carry = np.asarray(res.agent_state.history_carry)
    assert carry.shape[:2] == (2, 2)
    assert np.isfinite(carry).all()
    assert _replica_spread(res.agent_state.learner.params) == 0.0
    assert _replica_spread(res.agent_state.learner.summarizer_params) == 0.0


def test_mesh_csac_rc_safety_lambda_sync(mesh2):
    from pearl_tpu.safety_modules import RCSafetyModuleCostCriticContinuousAction

    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=256),
        safety_module=RCSafetyModuleCostCriticContinuousAction(
            constraint_value=0.05, batch_size=16
        ),
        store_cost=True,
    )
    res = online_learning(
        agent, Pendulum(emit_torque_cost=True), num_envs=4, max_steps=256,
        learn_every_k_steps=8, learning_starts=64, seed=0,
        stats="summary", mesh=mesh2,
    )
    lam = np.asarray(res.agent_state.safety.lagrangian)
    assert lam.shape == (2,)
    assert np.isfinite(lam).all()
    assert lam[0] == lam[1]  # lambda replicas identical (pmean'd drive signal)
    assert _replica_spread(res.agent_state.safety.critic_params) == 0.0
    # SAC alpha replicas identical (pmean'd alpha grad).
    assert _replica_spread(res.agent_state.learner.extra.log_alpha[:, None]) == 0.0


def test_mesh_restore_and_reshard(mesh2):
    agent = _dqn_agent()
    res = online_learning(
        agent, CartPole(), num_envs=8, max_steps=2048,
        learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
    )
    # Resume on the SAME mesh from the stacked state.
    res2 = online_learning(
        agent, CartPole(), num_envs=8, max_steps=1024,
        learn_every_k_steps=4, seed=1, stats="summary", mesh=mesh2,
        agent_state=res.agent_state,
    )
    assert _replica_spread(res2.agent_state.learner.params) == 0.0

    # Reshard 2 -> 1 and continue solo: replica 0's learner params carry over.
    solo = reshard_agent_state(res.agent_state, 1)
    mesh1 = make_mesh(1)
    res3 = online_learning(
        agent, CartPole(), num_envs=4, max_steps=512,
        learn_every_k_steps=4, seed=2, stats="summary", mesh=mesh1,
        agent_state=solo,
    )
    assert res3.total_steps == 512
    # Reshard 1 -> 2 (cyclic reuse) restores a full-width stack.
    wide = reshard_agent_state(solo, 2)
    lead = jax.tree.leaves(wide.learner)[0].shape[0]
    assert lead == 2


def test_mesh_wrong_stack_width_raises(mesh2):
    agent = _dqn_agent()
    res = online_learning(
        agent, CartPole(), num_envs=4, max_steps=256,
        learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
    )
    solo = reshard_agent_state(res.agent_state, 1)
    with pytest.raises(ValueError, match="reshard"):
        online_learning(
            agent, CartPole(), num_envs=4, max_steps=256,
            learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
            agent_state=solo,
        )


# ------------------------------------------------- replication guard (r4)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class _NoSyncDQN(DeepQLearning):
    """Deliberately-broken DP learner: applies LOCAL gradients (no pmean) —
    replicas diverge on the first learn from different env shards."""

    def _apply_gradients(self, state, loss_fn):
        return DeepQLearning._apply_gradients(
            dataclasses.replace(self, pmean_axis=None), state, loss_fn
        )


def test_check_replication_catches_missing_pmean(mesh2):
    broken = PearlAgent(
        policy_learner=_NoSyncDQN(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=512),
    )
    with pytest.raises(ValueError, match="missing its pmean"):
        online_learning(
            broken, CartPole(), num_envs=8, max_steps=8192,
            learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
            check_replication=True,
        )


def test_check_replication_passes_for_synced_learner(mesh2):
    res = online_learning(
        _dqn_agent(), CartPole(), num_envs=8, max_steps=4096,
        learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
        check_replication=True,
    )
    assert res.total_steps >= 4096


def test_mesh_vma_check_is_armed(mesh2):
    """shard_map's varying-manual-axes check must be ON for mesh programs
    (it was globally disabled in r3 to accommodate the LSTM carry; the
    carry is now promoted at its source instead)."""
    import inspect

    from pearl_tpu.training import online as online_mod

    src = inspect.getsource(online_mod._mesh_wrap)
    assert "check_vma=True" in src and "check_vma=False" not in src
