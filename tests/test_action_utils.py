"""Tie-breaking / masked-argmax surface (reference
test/unit/with_pytorch/test_action_utils.py, 493 LoC): the NO / PER_ROW /
BATCH strategies' exact semantics — tie membership, masking, per-row
independence vs batch consistency — plus the learner-level `tiebreaking`
config on the greedy act paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.policy_learners.exploration_modules import (
    TiebreakingStrategy,
    masked_argmax,
    masked_argmax_random_ties,
    masked_argmax_random_ties_batch,
    model_action_index,
)

SCORES = jnp.array(
    [
        [1.0, 2.0, 2.0, 0.0],  # tie between cols 1, 2
        [3.0, 3.0, 1.0, 3.0],  # tie between cols 0, 1, 3
        [0.0, 0.0, 0.0, 0.0],  # all tied
        [5.0, 1.0, 1.0, 1.0],  # unique max
    ]
)
MASK = jnp.array(
    [
        [True, True, False, True],  # masks out one tied col -> unique max 1
        [False, True, True, True],  # tie 1, 3 remain
        [True, False, True, False],  # tie 0, 2 remain
        [False, True, True, True],  # masks the max -> tie 1, 2, 3
    ]
)


def test_masked_argmax_deterministic_first_index():
    # NO_TIEBREAKING: torch.argmax picks an arbitrary-but-fixed member;
    # ours pins the FIRST maximal index (documented determinism).
    np.testing.assert_array_equal(
        np.asarray(masked_argmax(SCORES, None)), [1, 0, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(masked_argmax(SCORES, MASK)), [1, 1, 0, 1]
    )


def test_per_row_ties_stay_within_tie_set():
    # reference test_argmax_random_tie_break_per_row_no_mask/_mask
    tie_sets = [{1, 2}, {0, 1, 3}, {0, 1, 2, 3}, {0}]
    tie_sets_masked = [{1}, {1, 3}, {0, 2}, {1, 2, 3}]
    seen = [set() for _ in range(4)]
    seen_m = [set() for _ in range(4)]
    for s in range(64):
        k = jax.random.PRNGKey(s)
        idx = np.asarray(masked_argmax_random_ties(SCORES, None, k))
        idx_m = np.asarray(masked_argmax_random_ties(SCORES, MASK, k))
        for r in range(4):
            assert idx[r] in tie_sets[r], (r, idx[r])
            assert idx_m[r] in tie_sets_masked[r], (r, idx_m[r])
            seen[r].add(int(idx[r]))
            seen_m[r].add(int(idx_m[r]))
    # Uniform randomization reaches every tied member (64 draws).
    assert seen == tie_sets
    assert seen_m == tie_sets_masked


def test_per_row_epsilon_widens_ties():
    # reference argmax_random_tie_break_per_row(epsilon=1e-6): near-max
    # scores join the tie set.
    # Gap of 1e-6 is representable in float32 near 1.0 (machine eps 1.2e-7).
    scores = jnp.array([[1.0, 1.0 - 1e-6, 0.0]])
    assert float(scores[0, 0]) != float(scores[0, 1])
    seen = set()
    for s in range(32):
        seen.add(
            int(
                masked_argmax_random_ties(
                    scores, None, jax.random.PRNGKey(s), epsilon=1e-5
                )[0]
            )
        )
    assert seen == {0, 1}
    # epsilon=0: only the exact max.
    for s in range(8):
        assert (
            int(masked_argmax_random_ties(scores, None, jax.random.PRNGKey(s))[0])
            == 0
        )


def test_per_row_randomization_is_independent_across_rows():
    # reference test_independent_randomization: many identical all-tied rows
    # must NOT all pick the same column.
    scores = jnp.zeros((64, 4))
    idx = np.asarray(
        masked_argmax_random_ties(scores, None, jax.random.PRNGKey(0))
    )
    assert len(set(idx.tolist())) > 1


def test_batch_ties_consistent_across_rows():
    # reference argmax_random_tie_breaks_batch: "if several columns are tied
    # on 2 different rows, we will return the same index for each".
    scores = jnp.zeros((16, 5))  # every row all-tied
    for s in range(16):
        idx = np.asarray(
            masked_argmax_random_ties_batch(scores, None, jax.random.PRNGKey(s))
        )
        assert len(set(idx.tolist())) == 1  # one shared choice
    # ...and across seeds the shared choice varies (it IS randomized).
    picks = {
        int(
            masked_argmax_random_ties_batch(
                scores, None, jax.random.PRNGKey(s)
            )[0]
        )
        for s in range(32)
    }
    assert len(picks) > 1


def test_batch_ties_respect_mask_and_tie_sets():
    tie_sets_masked = [{1}, {1, 3}, {0, 2}, {1, 2, 3}]
    for s in range(48):
        idx = np.asarray(
            masked_argmax_random_ties_batch(SCORES, MASK, jax.random.PRNGKey(s))
        )
        for r in range(4):
            assert idx[r] in tie_sets_masked[r], (s, r, idx[r])


def test_model_action_index_dispatch():
    # reference get_model_action_index_batch:130-160
    k = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(
        np.asarray(
            model_action_index(SCORES, MASK, TiebreakingStrategy.NO_TIEBREAKING)
        ),
        np.asarray(masked_argmax(SCORES, MASK)),
    )
    np.testing.assert_array_equal(
        np.asarray(
            model_action_index(
                SCORES, MASK, TiebreakingStrategy.PER_ROW_TIEBREAKING, k
            )
        ),
        np.asarray(masked_argmax_random_ties(SCORES, MASK, k)),
    )
    np.testing.assert_array_equal(
        np.asarray(
            model_action_index(
                SCORES, MASK, TiebreakingStrategy.BATCH_TIEBREAKING, k
            )
        ),
        np.asarray(masked_argmax_random_ties_batch(SCORES, MASK, k)),
    )


def test_learner_tiebreaking_config_on_act_path():
    """The `tiebreaking` learner config drives exploit-action selection: an
    untrained (all-equal-Q) DQN picks a fixed arm under NO and spreads under
    PER_ROW/BATCH; configuring a strategy does not alter the exploration RNG
    stream (same episodes at NO vs default)."""
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.envs import CartPole
    from pearl_tpu.policy_learners.sequential_decision_making import (
        DeepQLearning,
    )
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import online_learning

    def run(tiebreaking):
        agent = PearlAgent(
            policy_learner=DeepQLearning(
                training_rounds=1, batch_size=16, tiebreaking=tiebreaking
            ),
            replay_buffer=BasicReplayBuffer(capacity=256),
        )
        return online_learning(
            agent, CartPole(), num_envs=4, max_steps=512,
            learn_every_k_steps=4, seed=0,
        )

    base = run(None)
    explicit_no = run(TiebreakingStrategy.NO_TIEBREAKING)
    np.testing.assert_array_equal(
        base.episode_returns, explicit_no.episode_returns
    )
    # PER_ROW runs and trains finitely (curves may legitimately differ).
    per_row = run(TiebreakingStrategy.PER_ROW_TIEBREAKING)
    batch = run(TiebreakingStrategy.BATCH_TIEBREAKING)
    for res in (per_row, batch):
        assert len(res.episode_returns) > 0
        for x in jax.tree.leaves(res.agent_state.learner.params):
            assert np.isfinite(np.asarray(x)).all()


def test_tabular_tiebreaking_override():
    """Tabular default stays PER_ROW (zero table must not collapse onto
    action 0); an explicit NO config makes it deterministic."""
    from pearl_tpu.api.spaces import DiscreteActionSpace
    from pearl_tpu.policy_learners.sequential_decision_making.tabular_q import (
        TabularQLearning,
    )

    space = DiscreteActionSpace.discrete(4)
    subj = jnp.zeros((16, 1), jnp.int32)

    def picks(tb):
        learner = TabularQLearning(num_states=4, tiebreaking=tb).bind(space)
        state = learner.init(jax.random.PRNGKey(0), 4, space, 16)
        out = set()
        for s in range(16):
            _, choice = learner.act(
                state, subj, None, jax.random.PRNGKey(s), exploit=False
            )
            out.update(np.asarray(choice.index).tolist())
        return out

    assert len(picks(None)) > 1  # default per-row randomization
    no = picks(TiebreakingStrategy.NO_TIEBREAKING)
    # NO: greedy part always picks arm 0; epsilon exploration may add others,
    # but with default epsilon=0.05 over 256 draws arm 0 dominates.
    assert 0 in no
