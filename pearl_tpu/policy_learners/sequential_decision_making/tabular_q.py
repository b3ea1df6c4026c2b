"""Tabular Q-learning (reference:
pearl/policy_learners/sequential_decision_making/tabular_q_learning.py:123-268).

The reference hashes arbitrary states into a Python dict — which cannot jit
(SURVEY.md §7 hard parts). Two implementations are provided:

- `TabularQLearning`: dense-table variant for FINITE state spaces — a
  (num_states, num_actions) array learner that composes with the standard
  jitted agent loop (states must be one-hot or integer-indexable).
- `DictTabularQLearning`: the reference-faithful host-side dict learner for
  arbitrary hashable observations, paired with the host loop in
  pearl_tpu.training.host_loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pearl_tpu.policy_learners.exploration_modules.common import (
    EGreedyExploration,
    masked_argmax,
    masked_argmax_random_ties,
)
from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner


@struct.dataclass
class TabularQState:
    q_table: jnp.ndarray  # (num_states, num_actions)
    explore_state: Any
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class TabularQLearning(PolicyLearner):
    """Dense-table Q-learning over one-hot observations."""

    num_states: int = 0
    learning_rate: float = 0.01
    discount_factor: float = 0.9
    exploration: Any = EGreedyExploration(epsilon=0.1)
    training_rounds: int = 1
    batch_size: int = 1

    @property
    def on_policy(self) -> bool:
        # Mirrors the reference default SingleTransitionReplayBuffer: learn
        # from each transition exactly once.
        return True

    def _state_index(self, subjective_state: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(subjective_state, axis=-1)

    def init(self, key, observation_dim, action_space, num_envs):
        n_states = self.num_states or observation_dim
        return TabularQState(
            q_table=jnp.zeros((n_states, action_space.n)),
            explore_state=self.exploration.init(num_envs),
        )

    def act(self, state, subjective_state, mask, key, exploit: bool = False):
        s_idx = self._state_index(subjective_state)
        scores = state.q_table[s_idx]  # (B, A)
        if exploit:
            index = masked_argmax(scores, mask)
            explore_state = state.explore_state
        else:
            k_tie, key = jax.random.split(key)
            # Random tie-breaking: an untrained all-zero table must not
            # collapse onto action 0 — tabular's default is PER_ROW
            # (reference TiebreakingStrategy); an explicit `tiebreaking`
            # config overrides it.
            if self.tiebreaking is None:
                exploit_index = masked_argmax_random_ties(scores, mask, k_tie)
            else:
                exploit_index = self.greedy_index(scores, mask, k_tie)
            explore_state, index = self.exploration.act(
                state.explore_state, scores, exploit_index, mask, key
            )
        action = self.action_space.elements[index]
        return (
            state.replace(explore_state=explore_state),
            ActionChoice(action=action, index=index),
        )

    def learn_batch(self, state, batch):
        s = self._state_index(batch.state)
        ns = self._state_index(batch.next_state)
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        next_v = jnp.max(state.q_table[ns], axis=-1)
        target = batch.reward + self.discount_factor * not_done * next_v
        current = state.q_table[s, batch.action_index]
        weight = batch.weight if batch.weight is not None else jnp.ones_like(target)
        td = (target - current) * weight
        q_table = state.q_table.at[s, batch.action_index].add(self.learning_rate * td)
        return state.replace(q_table=q_table), {"loss": jnp.mean(jnp.abs(td))}

    def learn(self, state, buffer, buffer_state, key, batch_transform=None):
        batch = buffer_state.storage
        n = batch.reward.shape[0]
        valid = (jnp.arange(n) < buffer_state.size).astype(jnp.float32)
        weight = batch.weight if batch.weight is not None else jnp.ones((n,))
        batch = batch.replace(weight=weight * valid)
        if batch_transform is not None:
            batch = batch_transform(batch)
        state, metrics = self.learn_batch(state, batch)
        return state, buffer_state, metrics


class DictTabularQLearning:
    """Reference-faithful host-side dict learner (tabular_q_learning.py):
    q_values[(state_key, action)] with single-transition updates. For
    arbitrary hashable observations; NOT jittable by design."""

    def __init__(
        self,
        learning_rate: float = 0.01,
        discount_factor: float = 0.9,
        exploration_rate: float = 0.01,
        seed: int = 0,
    ):
        self.learning_rate = learning_rate
        self.discount_factor = discount_factor
        self.exploration_rate = exploration_rate
        self.q_values: Dict[Tuple[Any, int], float] = {}
        self._rng = np.random.RandomState(seed)

    @staticmethod
    def _key(observation) -> Any:
        arr = np.asarray(observation)
        return arr.tobytes() if arr.ndim else arr.item()

    def act(self, observation, num_actions: int, exploit: bool = False) -> int:
        if not exploit and self._rng.rand() < self.exploration_rate:
            return int(self._rng.randint(num_actions))
        sk = self._key(observation)
        qs = np.array([self.q_values.get((sk, a), 0.0) for a in range(num_actions)])
        # Random tie-breaking (reference TiebreakingStrategy): an empty table
        # must not collapse onto action 0.
        best = np.flatnonzero(qs == qs.max())
        return int(best[0] if exploit else self._rng.choice(best))

    def learn(self, obs, action, reward, next_obs, terminated, num_actions: int):
        sk, nsk = self._key(obs), self._key(next_obs)
        next_v = 0.0
        if not terminated:
            next_v = max(
                self.q_values.get((nsk, a), 0.0) for a in range(num_actions)
            )
        target = float(reward) + self.discount_factor * next_v
        old = self.q_values.get((sk, int(action)), 0.0)
        self.q_values[(sk, int(action))] = old + self.learning_rate * (target - old)
