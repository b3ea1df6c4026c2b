"""Implicit Q-Learning (offline RL) (reference:
pearl/policy_learners/sequential_decision_making/implicit_q_learning.py:160-352).

Semantics preserved:
- Value net trained with the expectile loss L2_tau on Q_target(s,a) - V(s)
  (:194-206, 297-303).
- Twin critic regresses r + gamma(1-d) V(s') (:266-293).
- Advantage-weighted-regression actor: weights exp(beta * (Q_target - V))
  clipped at `advantage_clamp`, times -log pi(a|s) — discrete gather or
  continuous Gaussian log-prob (:208-264).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.value_networks import VanillaValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
    ActorCriticState,
)


@struct.dataclass
class IQLExtra:
    value_params: Any
    value_opt: Any


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class ImplicitQLearning(ActorCriticBase):
    value_network: Any = VanillaValueNetwork()
    value_learning_rate: float = 1e-3
    expectile: float = 0.75
    temperature_advantage_weighted_regression: float = 3.0
    advantage_clamp: float = 100.0

    @property
    def use_critic_target(self) -> bool:
        return True

    def value_optimizer(self):
        return optax.adamw(self.value_learning_rate, weight_decay=0.01)

    def init_extra(self, key):
        # Dims are not known here; value params are created lazily in init().
        return None

    def init(self, key, observation_dim, action_space, num_envs):
        state = super().init(key, observation_dim, action_space, num_envs)
        subj_dim, rep_dim, _ = self.dims(observation_dim, action_space)
        k_v = jax.random.fold_in(key, 7)
        value_params = self.value_network.init(k_v, subj_dim)
        return state.replace(
            extra=IQLExtra(
                value_params=value_params,
                value_opt=self.value_optimizer().init(value_params),
            )
        )

    def _q_target_sa(self, state, subj, action):
        return self.critic_network.q_min(state.critic_target_params, subj, action)

    def _critic_action(self, batch, B):
        """Action as the critic saw it at init: the raw vector for continuous
        spaces, the represented (e.g. one-hot) action for discrete ones —
        replay stores the raw env action, but the Q critic's input dim is the
        representation dim (reference preprocess_batch runs the action-rep
        module over batch.action, policy_learner.py:198-219)."""
        if self.is_continuous:
            return batch.action
        candidates = self.represented_candidates(B)
        idx = batch.action_index[:, None, None]
        return jnp.take_along_axis(
            candidates, jnp.broadcast_to(idx, (B, 1, candidates.shape[-1])), axis=1
        )[:, 0]

    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        action = self._critic_action(batch, subj.shape[0])
        q = jax.lax.stop_gradient(self._q_target_sa(state, subj, action))
        v = jax.lax.stop_gradient(
            self.value_network.value(state.extra.value_params, subj)
        )
        adv = self.temperature_advantage_weighted_regression * (q - v)
        weight = jnp.minimum(jnp.exp(adv), self.advantage_clamp)
        if self.is_continuous:
            low, high = self.action_space.low, self.action_space.high
            logp = self.actor.get_log_probability(
                actor_params, subj, batch.action, low, high
            )
        else:
            B = subj.shape[0]
            candidates = self.represented_candidates(B)
            probs = self.actor.get_policy_distribution(
                actor_params, subj, candidates, batch.curr_available_mask
            )
            from pearl_tpu.neural_networks.common import select_index_last

            # One-hot select (bit-identical; minor-dim gathers serialize on TPU).
            logp = jnp.log(
                jnp.clip(
                    select_index_last(probs, batch.action_index),
                    1e-8,
                    1.0,
                )
            )
        return -jnp.mean(weight * logp)

    def critic_loss(self, state, critic_params, summ_params, batch, subj, next_subj, key):
        v_next = jax.lax.stop_gradient(
            self.value_network.value(state.extra.value_params, next_subj)
        )
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        y = batch.reward + self.discount_factor * not_done * v_next
        q1, q2 = self.critic_network.q_both(
            critic_params, subj, self._critic_action(batch, subj.shape[0])
        )
        return (jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)) / 2.0

    def post_update(self, state: ActorCriticState, batch):
        subj = self.history_summarizer.forward(state.summarizer_params, batch.state)
        q = jax.lax.stop_gradient(
            self._q_target_sa(state, subj, self._critic_action(batch, subj.shape[0]))
        )

        def value_loss_fn(value_params):
            v = self.value_network.value(value_params, subj)
            u = q - v
            # Expectile (asymmetric L2) loss (implicit_q_learning.py:297-303).
            w = jnp.abs(self.expectile - (u < 0.0).astype(jnp.float32))
            return jnp.mean(w * u**2)

        loss, grads = jax.value_and_grad(value_loss_fn)(state.extra.value_params)
        if self.pmean_axis:
            grads = jax.lax.pmean(grads, self.pmean_axis)
        updates, value_opt = self.value_optimizer().update(
            grads, state.extra.value_opt, state.extra.value_params
        )
        value_params = optax.apply_updates(state.extra.value_params, updates)
        return (
            state.replace(extra=IQLExtra(value_params=value_params, value_opt=value_opt)),
            {"value_loss": loss},
        )
