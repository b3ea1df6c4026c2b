"""LinUCB / LinTS (reference:
pearl/policy_learners/contextual_bandits/linear_bandit.py:94-224).

Closed-form weighted least squares on [state; action-representation]
features; exploration scores all arms with mu + alpha*sigma (UCB) or sampled
scores (Thompson). Discounting of the sufficient statistics every
`apply_discounting_interval` accumulated weight is handled inside
LinearRegression."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

from pearl_tpu.neural_networks.contextual_bandit import (
    LinearRegression,
    LinearRegressionState,
)
from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase


@struct.dataclass
class LinearBanditState:
    model: LinearRegressionState
    explore_state: Any
    # Bandit learners have no learned summarizer; keep the protocol field.
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class LinearBandit(ContextualBanditBase):
    l2_reg_lambda: float = 1.0
    gamma: float = 1.0
    apply_discounting_interval: float = 0.0
    pmean_axis: Any = None

    @property
    def on_policy(self) -> bool:
        # Closed-form sufficient statistics must fold each observation in
        # exactly once: the agent clears the buffer after every learn,
        # mirroring the reference's 1-slot SingleTransitionReplayBuffer
        # default (pearl_agent.py:50-53).
        return True

    def _model(self, observation_dim: int) -> LinearRegression:
        return LinearRegression(
            feature_dim=self.feature_dim(observation_dim),
            l2_reg_lambda=self.l2_reg_lambda,
            gamma=self.gamma,
            apply_discounting_interval=self.apply_discounting_interval,
            pmean_axis=self.pmean_axis,
        )

    def init(self, key, observation_dim, action_space, num_envs):
        model = self._model(observation_dim)
        return LinearBanditState(
            model=model.init(),
            explore_state=self.exploration.init(num_envs),
        )

    def model_def_for(self, state: LinearBanditState) -> LinearRegression:
        """Recover the model config from the state's own dims (keeps the
        learner config stateless)."""
        return LinearRegression(
            feature_dim=int(state.model.A.shape[-1]) - 1,
            l2_reg_lambda=self.l2_reg_lambda,
            gamma=self.gamma,
            apply_discounting_interval=self.apply_discounting_interval,
            pmean_axis=self.pmean_axis,
        )

    def mu_sigma(self, state: LinearBanditState, features: jnp.ndarray):
        model = self.model_def_for(state)
        mu = model.predict(state.model, features)
        sigma = model.calculate_sigma(state.model, features)
        return mu, sigma

    def learn_batch(self, state: LinearBanditState, batch):
        feats = self.batch_features(batch)
        model = self.model_def_for(state)
        new_model = model.update(state.model, feats, batch.reward, batch.weight)
        mu = model.predict(new_model, feats)
        loss = jnp.mean((mu - batch.reward) ** 2)
        return state.replace(model=new_model), {"mse": loss}

    # --- per-arm protocol for DisjointBanditContainer --------------------
    def _arm_model(self, feature_dim: int) -> LinearRegression:
        return LinearRegression(
            feature_dim=feature_dim,
            l2_reg_lambda=self.l2_reg_lambda,
            gamma=self.gamma,
            apply_discounting_interval=self.apply_discounting_interval,
            pmean_axis=self.pmean_axis,
        )

    def arm_init(self, key, feature_dim: int):
        del key  # closed-form model: no random init
        return self._arm_model(feature_dim).init()

    def arm_mu_sigma(self, arm_state, feats: jnp.ndarray):
        model = self._arm_model(int(arm_state.A.shape[-1]) - 1)
        return model.predict(arm_state, feats), model.calculate_sigma(arm_state, feats)

    def arm_update(self, arm_state, feats, reward, weight):
        model = self._arm_model(int(arm_state.A.shape[-1]) - 1)
        return model.update(arm_state, feats, reward, weight)

    def learn(self, state, buffer, buffer_state, key):
        """Consume the WHOLE buffer exactly once, weighting invalid slots 0.

        The reference pairs bandit learners with a SingleTransitionReplayBuffer
        so each observation enters the closed-form WLS exactly once
        (policy_learner.py:163-196 + single_transition_replay_buffer.py).
        The vectorized equivalent: size the buffer to num_envs, learn every
        step, fold in every slot once with validity weights — resampling would
        double-count data in the sufficient statistics.
        """
        import jax
        import jax.numpy as jnp_

        batch = buffer_state.storage
        n = batch.reward.shape[0]
        valid = (jnp_.arange(n) < buffer_state.size).astype(jnp_.float32)
        weight = batch.weight if batch.weight is not None else jnp_.ones((n,))
        batch = batch.replace(weight=weight * valid)
        state, metrics = self.learn_batch(state, batch)
        return state, buffer_state, metrics
