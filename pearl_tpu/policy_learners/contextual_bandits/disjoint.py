"""Disjoint bandit container (reference:
pearl/policy_learners/contextual_bandits/disjoint_bandit.py:77-287 and the
deprecated disjoint_linear_bandit.py).

One independent LinearRegression per arm over STATE features. The reference
partitions each batch by action index in Python and feeds a "null batch" to
empty arms (:77-162); here every arm updates every step with per-arm weights
w * 1{action_index == arm} — a zero-weight update leaves the sufficient
statistics untouched, so no partitioning, no ragged shapes, and the whole
container updates as one vmapped op (replacing `ensemble_forward`'s Python
loop, :172-201)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.neural_networks.contextual_bandit import LinearRegression
from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase


@struct.dataclass
class DisjointBanditState:
    models: Any  # stacked LinearRegressionState, leading axis = num_arms
    explore_state: Any
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DisjointBanditContainer(ContextualBanditBase):
    l2_reg_lambda: float = 1.0
    state_features_only: bool = True  # disjoint arms score the raw context

    def _model(self, observation_dim: int) -> LinearRegression:
        return LinearRegression(
            feature_dim=self.feature_dim(observation_dim),
            l2_reg_lambda=self.l2_reg_lambda,
        )

    def init(self, key, observation_dim, action_space, num_envs):
        model = self._model(observation_dim)
        num_arms = action_space.n
        models = jax.vmap(lambda _: model.init())(jnp.arange(num_arms))
        return DisjointBanditState(
            models=models, explore_state=self.exploration.init(num_envs)
        )

    def _model_for(self, state) -> LinearRegression:
        return LinearRegression(
            feature_dim=int(state.models.A.shape[-1]) - 1,
            l2_reg_lambda=self.l2_reg_lambda,
        )

    def mu_sigma(self, state: DisjointBanditState, features):
        # features: (B, A, f) — per-arm contexts (identical state features for
        # plain disjoint; 3-D per-arm states supported naturally).
        model = self._model_for(state)

        def per_arm(arm_state, arm_feats):
            mu = model.predict(arm_state, arm_feats)
            sigma = model.calculate_sigma(arm_state, arm_feats)
            return mu, sigma

        mu, sigma = jax.vmap(per_arm, in_axes=(0, 1), out_axes=1)(
            state.models, features
        )
        return mu, sigma

    @property
    def on_policy(self) -> bool:
        return True  # closed-form stats: fold each observation in once

    def learn_batch(self, state: DisjointBanditState, batch):
        feats = self.batch_features(batch)  # (B, f) of the taken action's arm
        weight = batch.weight if batch.weight is not None else jnp.ones_like(batch.reward)
        num_arms = int(state.models.A.shape[0])
        model = self._model_for(state)

        def per_arm(arm_state, arm_idx):
            w = weight * (batch.action_index == arm_idx).astype(jnp.float32)
            return model.update(arm_state, feats, batch.reward, w)

        models = jax.vmap(per_arm)(state.models, jnp.arange(num_arms))
        return state.replace(models=models), {}

    def learn(self, state, buffer, buffer_state, key):
        batch = buffer_state.storage
        n = batch.reward.shape[0]
        valid = (jnp.arange(n) < buffer_state.size).astype(jnp.float32)
        weight = batch.weight if batch.weight is not None else jnp.ones((n,))
        batch = batch.replace(weight=weight * valid)
        state, metrics = self.learn_batch(state, batch)
        return state, buffer_state, metrics


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DisjointLinearBandit(DisjointBanditContainer):
    """Deprecated alias kept for API parity (reference
    disjoint_linear_bandit.py:35-144 — one LinearRegression per action)."""
