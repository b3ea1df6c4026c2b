"""Contextual-bandit learner base (reference:
pearl/policy_learners/contextual_bandits/contextual_bandit_base.py:31-116).

A bandit learner scores every arm with (mu, sigma) from its model and lets a
`BanditExplorationModule` pick; `learn_batch` fits the model on
(feature, reward, weight) triples. Features are concat(subjective_state,
action_representation) per arm, exactly like the reference's
`concatenate_actions_to_state`."""

from __future__ import annotations

import abc
import dataclasses
from typing import Any

import jax.numpy as jnp

from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    BanditExplorationModule,
    UCBExploration,
)
from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class ContextualBanditBase(PolicyLearner):
    exploration: BanditExplorationModule = UCBExploration(alpha=1.0)
    training_rounds: int = 1
    batch_size: int = 128
    # When True, the model sees only state features (neural_bandit.py
    # `state_features_only`).
    state_features_only: bool = False

    def arm_features(self, subjective_state: jnp.ndarray) -> jnp.ndarray:
        """(B, s) -> (B, A, f): per-arm feature vectors [s ; a_repr]."""
        B = subjective_state.shape[0]
        candidates = self.represented_candidates(B)  # (B, A, r)
        if self.state_features_only:
            return jnp.broadcast_to(
                subjective_state[:, None, :],
                (B, candidates.shape[1], subjective_state.shape[-1]),
            )
        s_rep = jnp.broadcast_to(
            subjective_state[:, None, :],
            (B, candidates.shape[1], subjective_state.shape[-1]),
        )
        return jnp.concatenate([s_rep, candidates], axis=-1)

    def feature_dim(self, observation_dim: int) -> int:
        subj_dim, rep_dim, _ = self.dims(observation_dim, self.action_space)
        if self.state_features_only:
            return subj_dim
        return subj_dim + rep_dim

    @abc.abstractmethod
    def mu_sigma(self, state, features: jnp.ndarray):
        """(B, A, f) -> (mu (B, A), sigma (B, A))."""

    def get_scores(self, state, subjective_state: jnp.ndarray) -> jnp.ndarray:
        """Exploration-aware scores for all arms (reference `get_scores`)."""
        feats = self.arm_features(subjective_state)
        mu, sigma = self.mu_sigma(state, feats)
        if hasattr(self.exploration, "scores"):
            return self.exploration.scores(mu, sigma)
        return mu

    def act(self, state, subjective_state, mask, key, exploit: bool = False):
        feats = self.arm_features(subjective_state)
        mu, sigma = self.mu_sigma(state, feats)
        if exploit:
            index = self.greedy_index(mu, mask, key)
            explore_state = self._explore_state_of(state)
        else:
            explore_state, index = self.exploration.act_scores(
                self._explore_state_of(state), mu, sigma, mask, key
            )
        action = self.action_space.elements[index]
        return (
            self._with_explore_state(state, explore_state),
            ActionChoice(action=action, index=index),
        )

    # Bandit learner states store their exploration sub-state under
    # `.explore_state` by convention.
    def _explore_state_of(self, state):
        return state.explore_state

    def _with_explore_state(self, state, explore_state):
        return state.replace(explore_state=explore_state)

    def batch_features(self, batch) -> jnp.ndarray:
        """Features of the TAKEN action for a sampled batch: (B, f)."""
        rep = self.resolved_action_representation(self.action_space)
        a_repr = rep.apply(batch.action)
        if self.state_features_only:
            return batch.state
        return jnp.concatenate([batch.state, a_repr], axis=-1)
