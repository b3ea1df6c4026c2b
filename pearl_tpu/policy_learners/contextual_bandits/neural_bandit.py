"""Neural bandit (reference:
pearl/policy_learners/contextual_bandits/neural_bandit.py:83-229).

MLP reward regressor on [state; action-representation] with weighted
MSE/MAE/BCE loss; sigma is zero (exploration types that need uncertainty use
the neural-linear variant)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.common import MLP
from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase


@struct.dataclass
class NeuralBanditState:
    params: Any
    opt_state: Any
    explore_state: Any
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class NeuralBandit(ContextualBanditBase):
    hidden_dims: tuple = (64, 64)
    learning_rate: float = 1e-3
    loss_type: str = "mse"  # mse | mae | cross_entropy
    training_rounds: int = 10
    batch_size: int = 128

    def _net(self) -> MLP:
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1)

    def optimizer(self):
        return optax.adamw(self.learning_rate, weight_decay=0.01)

    def init(self, key, observation_dim, action_space, num_envs):
        f = self.feature_dim(observation_dim)
        params = self._net().init(key, jnp.zeros((1, f)))["params"]
        return NeuralBanditState(
            params=params,
            opt_state=self.optimizer().init(params),
            explore_state=self.exploration.init(num_envs),
        )

    def _predict(self, params, features):
        out = self._net().apply({"params": params}, features)
        return out[..., 0]

    def mu_sigma(self, state, features):
        B, A, f = features.shape
        mu = self._predict(state.params, features.reshape(B * A, f)).reshape(B, A)
        return mu, jnp.zeros_like(mu)

    def _loss(self, pred, target, weight):
        if self.loss_type == "mse":
            per = (pred - target) ** 2
        elif self.loss_type == "mae":
            per = jnp.abs(pred - target)
        elif self.loss_type == "cross_entropy":
            p = jax.nn.sigmoid(pred)
            per = -(target * jnp.log(p + 1e-8) + (1 - target) * jnp.log(1 - p + 1e-8))
        else:
            raise ValueError(f"unknown loss_type {self.loss_type}")
        return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1e-8)

    def learn_batch(self, state: NeuralBanditState, batch):
        feats = self.batch_features(batch)
        weight = batch.weight if batch.weight is not None else jnp.ones_like(batch.reward)

        def loss_fn(params):
            pred = self._predict(params, feats)
            return self._loss(pred, batch.reward, weight)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer().update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state), {"loss": loss}

    # --- per-arm protocol for DisjointBanditContainer --------------------
    # (the reference composes arbitrary ContextualBanditBase learners per arm,
    # disjoint_bandit.py:77-162; here arm states are stacked pytrees the
    # container vmaps over — its `ensemble_forward` analog, :172-201)
    def arm_init(self, key, feature_dim: int):
        params = self._net().init(key, jnp.zeros((1, feature_dim)))["params"]
        return {"params": params, "opt": self.optimizer().init(params)}

    def arm_mu_sigma(self, arm_state, feats: jnp.ndarray):
        mu = self._predict(arm_state["params"], feats)
        return mu, jnp.zeros_like(mu)

    def arm_update(self, arm_state, feats, reward, weight):
        def loss_fn(params):
            return self._loss(self._predict(params, feats), reward, weight)

        _, grads = jax.value_and_grad(loss_fn)(arm_state["params"])
        updates, opt = self.optimizer().update(
            grads, arm_state["opt"], arm_state["params"]
        )
        return {"params": optax.apply_updates(arm_state["params"], updates), "opt": opt}
