"""Neural LinUCB / Neural LinTS (reference:
pearl/policy_learners/contextual_bandits/neural_linear_bandit.py:45-314,
arXiv 2012.01780).

MLP feature extractor with a LinearRegression head over the learned features.
Per learn_batch: one SGD step on the end-to-end regression loss AND a
closed-form update of the LinUCB statistics on the (stop-gradient) features —
mirroring the reference's joint update (:160-226). `nn_e2e`: mu from the
end-to-end linear output head, sigma from the LinUCB statistics (:45-127).
The reference's zero-weight all-reduce parity trick (:209-216) is subsumed by
psum over the mesh axis (always executed, weights may be zero)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.contextual_bandit import NeuralLinearRegression
from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase


@struct.dataclass
class NeuralLinearBanditState:
    mlp_params: Any
    head_params: Any
    linreg: Any
    opt_state: Any
    explore_state: Any
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class NeuralLinearBandit(ContextualBanditBase):
    hidden_dims: tuple = (64, 64)
    linear_feature_dim: int = 16
    learning_rate: float = 1e-3
    nn_e2e: bool = True
    l2_reg_lambda: float = 1.0
    pmean_axis: Any = None
    training_rounds: int = 10
    batch_size: int = 128
    # Output activation on mu (e.g. "sigmoid" for click-probability heads)
    # and UCB activation placement (reference neural_linear_bandit.py:261-314
    # `separate_uncertainty`):
    #   False (joint):    score = activation(mu_pre + alpha * sigma)
    #   True (separate):  score = activation(mu_pre) + alpha * sigma
    # The placement changes which arm UCB explores whenever the activation is
    # nonlinear. With the default "linear" activation both modes coincide.
    # On the act path the joint mode's outer activation is monotone, so
    # argmax is taken pre-activation (identical arm choice, one op fewer).
    output_activation: str = "linear"
    separate_uncertainty: bool = False

    def _nlr(self, observation_dim=None, feature_dim=None) -> NeuralLinearRegression:
        f = feature_dim if feature_dim is not None else self.feature_dim(observation_dim)
        return NeuralLinearRegression(
            feature_dim=f,
            hidden_dims=tuple(self.hidden_dims),
            linear_feature_dim=self.linear_feature_dim,
            nn_e2e=self.nn_e2e,
            output_activation=self.output_activation,
        )

    def optimizer(self):
        return optax.adamw(self.learning_rate, weight_decay=0.01)

    def init(self, key, observation_dim, action_space, num_envs):
        nlr = self._nlr(observation_dim)
        params = nlr.init(key)
        trainable = {"mlp": params["mlp"], "head": params["head"]}
        return NeuralLinearBanditState(
            mlp_params=params["mlp"],
            head_params=params["head"],
            linreg=params["linreg"],
            opt_state=self.optimizer().init(trainable),
            explore_state=self.exploration.init(num_envs),
        )

    def _nlr_for(self, features) -> NeuralLinearRegression:
        return self._nlr(feature_dim=int(features.shape[-1]))

    def mu_sigma(self, state, features):
        """(mu, sigma) per arm. `separate_uncertainty=True` activates mu
        HERE, so the exploration module's mu + alpha*sigma realizes the
        reference's activation(mu) + alpha*sigma; the joint mode returns
        pre-activation mu and activates the combined score in get_scores
        (argmax on the act path is activation-invariant)."""
        B, A, f = features.shape
        nlr = self._nlr_for(features)
        flat = features.reshape(B * A, f)
        params = {
            "mlp": state.mlp_params,
            "head": state.head_params,
            "linreg": state.linreg,
        }
        mu, sigma, _ = nlr.forward_with_intermediate_values(params, flat)
        if self.separate_uncertainty:
            mu = nlr.apply_output_activation(mu)
        return mu.reshape(B, A), sigma.reshape(B, A)

    def get_scores(self, state, subjective_state):
        """UCB scores with the reference's activation placement
        (neural_linear_bandit.py:261-314)."""
        from pearl_tpu.neural_networks.common import resolve_activation

        scores = super().get_scores(state, subjective_state)
        if not self.separate_uncertainty:
            scores = resolve_activation(self.output_activation)(scores)
        return scores

    def learn_batch(self, state: NeuralLinearBanditState, batch):
        feats_in = self.batch_features(batch)
        nlr = self._nlr_for(feats_in)
        weight = batch.weight if batch.weight is not None else jnp.ones_like(batch.reward)

        def loss_fn(trainable):
            learned = nlr.mlp().apply({"params": trainable["mlp"]}, feats_in)
            pred = nlr.head().apply({"params": trainable["head"]}, learned)[..., 0]
            # Train through the activated head (reference fits
            # output_activation(linear(features)) to rewards).
            pred = nlr.apply_output_activation(pred)
            per = (pred - batch.reward) ** 2
            return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1e-8)

        trainable = {"mlp": state.mlp_params, "head": state.head_params}
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        if self.pmean_axis is not None:
            grads = jax.lax.pmean(grads, self.pmean_axis)
        updates, opt_state = self.optimizer().update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)

        # LinUCB statistics over the (post-update) learned features.
        learned = jax.lax.stop_gradient(
            nlr.mlp().apply({"params": trainable["mlp"]}, feats_in)
        )
        linreg_def = nlr.linear_regression(pmean_axis=self.pmean_axis)
        linreg = linreg_def.update(state.linreg, learned, batch.reward, weight)

        return (
            state.replace(
                mlp_params=trainable["mlp"],
                head_params=trainable["head"],
                linreg=linreg,
                opt_state=opt_state,
            ),
            {"loss": loss},
        )
