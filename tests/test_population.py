"""Population training (training/population.py): a whole seed sweep vmapped
into one compiled program — the TPU-native replacement for the reference's
one-OS-process-per-run sweep fan-out (benchmark.py:75-118)."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning, population_learning


def _dqn_agent():
    return PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=1,
            batch_size=64,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=4_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=8_192),
    )


def test_population_member_matches_solo_run():
    """Member m of a population is the SAME training run as a solo
    online_learning call at seed m: identical key discipline, identical chunk
    program, so learner params agree to float tolerance after equal steps."""
    agent = _dqn_agent()
    env = CartPole()
    kw = dict(
        num_envs=8,
        max_steps=2_048,
        learn_every_k_steps=8,
        learning_starts=256,
    )
    pop = population_learning(agent, env, num_members=2, seeds=[7, 11], **kw)
    for i, s in enumerate([7, 11]):
        solo = online_learning(agent, env, seed=s, stats="summary", **kw)
        got = pop.member_state(i).learner.params
        want = solo.agent_state.learner.params
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )


def test_population_members_diverge_and_learn():
    """Different seeds produce different members; every member's recent
    return improves over a modest budget (the 4-seed sweep in one program)."""
    pop = population_learning(
        _dqn_agent(),
        CartPole(),
        num_members=4,
        num_envs=16,
        max_steps=40_000,
        learn_every_k_steps=4,
        learning_starts=1_000,
        seed=3,
    )
    assert pop.return_curves.shape[1] == 4
    assert (pop.total_episodes > 0).all()
    # seeds differ -> members differ
    p0 = jax.tree.leaves(pop.member_state(0).learner.params)[0]
    p1 = jax.tree.leaves(pop.member_state(1).learner.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # every member learns: recent-episode return beats the early curve
    early = pop.return_curves[: max(len(pop.return_curves) // 10, 1)].mean(axis=0)
    assert (pop.recent_returns > early).all(), (early, pop.recent_returns)
    assert pop.recent_returns.mean() > 2.0 * early.mean()


def test_population_shared_ring_cursor_is_exact():
    """The shared-cursor fast path (cursor/size unbatched under the member
    vmap — population.py _member_axes) is a pure layout change: training is
    numerically identical to the per-member-cursor path."""
    agent = _dqn_agent()
    env = CartPole()
    kw = dict(
        num_members=2,
        seeds=[3, 9],
        num_envs=8,
        max_steps=2_048,
        learn_every_k_steps=8,
        learning_starts=256,
    )
    fast = population_learning(agent, env, shared_ring_cursor=True, **kw)
    slow = population_learning(agent, env, shared_ring_cursor=False, **kw)
    for a, b in zip(
        jax.tree.leaves(fast.agent_states.learner.params),
        jax.tree.leaves(slow.agent_states.learner.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    # the re-broadcast cursor matches the per-member cursors
    np.testing.assert_array_equal(
        np.asarray(fast.agent_states.replay.cursor),
        np.asarray(slow.agent_states.replay.cursor),
    )


def test_population_target_stops_when_all_members_reach():
    """target_return stops the sweep only when EVERY member's recent stat is
    at target — tiny-threshold smoke (any learning run clears return 15)."""
    pop = population_learning(
        _dqn_agent(),
        CartPole(),
        num_members=2,
        num_envs=16,
        max_steps=60_000,
        learn_every_k_steps=4,
        learning_starts=1_000,
        seed=0,
        target_return=15.0,
    )
    assert pop.reached_target
    assert pop.total_steps < 60_000
    # The stop fires on the dispatch row where EVERY member's recent stat is
    # at target (the stat may dip again during the one pipelined extra
    # dispatch, exactly like online_learning's read-behind early stop).
    assert (pop.return_curves.max(axis=0) >= 15.0).all()


def test_population_state_resident_hyperparameter_sweep():
    """member_state_transform sweeps a state-resident hyperparameter:
    discrete SAC's actor learning rate lives in the optimizer state
    (optax.inject_hyperparams, sac.py:66-69) — give each member a different
    lr at the SAME seed and verify the members train and stay distinct."""
    import dataclasses

    from pearl_tpu.policy_learners.sequential_decision_making import SoftActorCritic

    agent = PearlAgent(
        policy_learner=SoftActorCritic(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=2_048),
    )
    lrs = jnp.array([1e-4, 1e-3, 1e-2])

    def set_lrs(member_idx, astates):
        learner = astates.learner
        # inject_hyperparams exposes the actor lr as a state leaf at
        # actor_opt.hyperparams["learning_rate"] (an optax NamedTuple state);
        # overwrite the stacked (M,) leaf with one lr per member.
        hp = dict(learner.actor_opt.hyperparams)
        hp["learning_rate"] = lrs
        actor_opt = learner.actor_opt._replace(hyperparams=hp)
        return dataclasses.replace(
            astates, learner=dataclasses.replace(learner, actor_opt=actor_opt)
        )

    pop = population_learning(
        agent,
        CartPole(),
        num_members=3,
        num_envs=8,
        max_steps=2_048,
        learn_every_k_steps=8,
        learning_starts=256,
        seeds=[5, 5, 5],  # SAME seed: only the lr axis differs
        member_state_transform=set_lrs,
    )
    a = [jax.tree.leaves(pop.member_state(i).learner.actor_params)[0] for i in range(3)]
    assert not np.allclose(np.asarray(a[0]), np.asarray(a[1]))
    assert not np.allclose(np.asarray(a[1]), np.asarray(a[2]))
    for leaf in jax.tree.leaves(pop.agent_states.learner):
        assert np.isfinite(np.asarray(leaf)).all()
