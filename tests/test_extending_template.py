"""Executable guard for docs/EXTENDING.md: the document's example learner
(ClippedRewardDQN) + registry row really do flow through the matrix suites'
row logic, and enrollment in METHODS is sufficient for coverage (the four
matrices parametrize over the registry, so a new row cannot be silently
untested)."""

import dataclasses
import inspect

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.benchmarks.configs import METHODS, Method
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


# --- the EXTENDING.md example, verbatim in spirit -------------------------
@dataclasses.dataclass(frozen=True)
class ClippedRewardDQN(DeepQLearning):
    clip: float = 1.0

    def learn_batch(self, state, batch):
        batch = batch.replace(
            reward=jnp.clip(batch.reward, -self.clip, self.clip)
        )
        return super().learn_batch(state, batch)


def _example_row() -> Method:
    return Method(
        "ClippedDQN",
        lambda num_envs: PearlAgent(
            policy_learner=ClippedRewardDQN(
                training_rounds=2, batch_size=32,
                exploration=EGreedyExploration(epsilon=0.1),
            ),
            replay_buffer=BasicReplayBuffer(capacity=4_096),
        ),
        learn_every_k_steps=4,
    )


def test_example_row_passes_the_all_methods_row_logic(tmp_path):
    """Run the doc's row through the same checks the all-methods matrix
    applies to every registry row: build -> env pairing -> short training ->
    finite state -> checkpoint roundtrip."""
    from pearl_tpu.utils import tree_allclose
    from pearl_tpu.utils.checkpoint import restore, save
    from tests.test_all_methods_matrix import env_for_method

    method = _example_row()
    agent = method.make_agent(4)
    env = env_for_method(method, agent)
    res = online_learning(
        agent, env, num_envs=4, max_steps=4 * 64,
        learn_every_k_steps=method.learn_every_k_steps,
        learning_starts=64, seed=0,
    )
    for x in jax.tree.leaves(res.agent_state.learner.params):
        assert np.isfinite(np.asarray(x)).all()
    save(tmp_path / "ck", res.agent_state)
    restored = restore(tmp_path / "ck", res.agent_state)
    assert tree_allclose(restored, res.agent_state)


def test_example_learner_clips_rewards_in_learn():
    """The override actually bites: with clip=0.0 every TD target reward is
    zero, so the fitted Q collapses toward zero while plain DQN's does not
    (CartPole rewards are +1 per step)."""
    from pearl_tpu.envs import CartPole

    def fit(learner):
        agent = PearlAgent(
            policy_learner=learner,
            replay_buffer=BasicReplayBuffer(capacity=4_096),
        )
        res = online_learning(
            agent, CartPole(), num_envs=4, max_steps=4 * 512,
            learn_every_k_steps=2, learning_starts=64, seed=1,
        )
        astate = res.agent_state
        learner_b = agent.policy_learner.bind(CartPole().action_space)
        scores = learner_b.scores_for_probe(astate.learner) if hasattr(
            learner_b, "scores_for_probe"
        ) else None
        return astate, scores

    clipped, _ = fit(
        ClippedRewardDQN(
            training_rounds=4, batch_size=64,
            exploration=EGreedyExploration(epsilon=0.1), clip=0.0,
        )
    )
    plain, _ = fit(
        DeepQLearning(
            training_rounds=4, batch_size=64,
            exploration=EGreedyExploration(epsilon=0.1),
        )
    )
    # Probe Q-values at a fixed state through the public q_network.
    obs = jnp.zeros((1, 4))
    cand = jnp.broadcast_to(jnp.eye(2)[None], (1, 2, 2))
    q_clip = ClippedRewardDQN().q_network.q_all(
        clipped.learner.params, obs, cand
    )
    q_plain = DeepQLearning().q_network.q_all(plain.learner.params, obs, cand)
    assert float(jnp.max(jnp.abs(q_clip))) < float(jnp.max(jnp.abs(q_plain)))
    assert float(jnp.max(jnp.abs(q_clip))) < 0.5  # zero-reward fixed point


def test_matrix_suites_parametrize_over_the_registry():
    """Enrollment == coverage: each matrix suite's row test is parametrized
    over METHODS, so adding a registry row automatically adds four CI rows.
    (Guards against a refactor quietly switching a suite to a hand-kept
    list.)"""
    import tests.test_all_methods_matrix as m1
    import tests.test_compare_semantics as m3
    import tests.test_learning_signal_matrix as m2

    for mod in (m1, m2, m3):
        src = inspect.getsource(mod)
        # The parametrization really enumerates the live registry.
        assert "sorted(METHODS" in src and "parametrize" in src, mod.__name__
    # The benchmark runner resolves rows from the same registry by name, so
    # a new row is immediately benchmarkable too.
    import pearl_tpu.benchmarks.run as runner

    assert "METHODS" in inspect.getsource(runner)
    assert len(METHODS) >= 39  # the reference-scale ~40-method registry
