"""Continuous-action Soft Actor-Critic (reference:
pearl/policy_learners/sequential_decision_making/soft_actor_critic_continuous.py:106-232).

Semantics preserved:
- Gaussian actor with tanh squash + log-prob Jacobian correction
  (GaussianActorNetwork).
- Clipped double-Q critic: y = r + gamma(1-d)(min Q_target(s', a') -
  alpha log pi(a'|s')), a' ~ pi(.|s').
- Actor loss: E[alpha log pi(a|s) - min Q(s, a)], a rsampled.
- Temperature auto-tuning toward target entropy = -action_dim when
  `entropy_autotune` (reference :119-143).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.actor_networks import GaussianActorNetwork
from pearl_tpu.policy_learners.exploration_modules.common import NoExploration
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
    ActorCriticState,
)


@struct.dataclass
class AlphaState:
    log_alpha: jnp.ndarray
    opt_state: Any


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class ContinuousSoftActorCritic(ActorCriticBase):
    actor_network: Any = GaussianActorNetwork()
    exploration: Any = NoExploration()  # SAC explores via its stochastic policy
    entropy_coef: float = 0.2
    entropy_autotune: bool = True
    alpha_learning_rate: float = 3e-4
    actor_learning_rate: float = 3e-4
    critic_learning_rate: float = 3e-4

    @property
    def use_critic_target(self) -> bool:
        return True

    def _target_entropy(self) -> float:
        return -float(self.action_space.action_dim)

    def alpha_optimizer(self):
        return optax.adam(self.alpha_learning_rate)

    def init_extra(self, key):
        if not self.entropy_autotune:
            return None
        log_alpha = jnp.log(jnp.float32(self.entropy_coef))
        return AlphaState(
            log_alpha=log_alpha, opt_state=self.alpha_optimizer().init(log_alpha)
        )

    def _alpha(self, state) -> jnp.ndarray:
        if state.extra is None:
            return jnp.float32(self.entropy_coef)
        return jnp.exp(state.extra.log_alpha)

    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        low, high = self.action_space.low, self.action_space.high
        action, log_prob = self.actor.sample_action(
            actor_params, subj, key, low, high
        )
        q = self.critic_network.q_min(state.critic_params, subj, action)
        return jnp.mean(self._alpha(state) * log_prob - q)

    def critic_loss(self, state, critic_params, summ_params, batch, subj, next_subj, key):
        low, high = self.action_space.low, self.action_space.high
        next_action, next_log_prob = self.actor.sample_action(
            state.actor_params, next_subj, key, low, high
        )
        q_target = self.critic_network.q_min(
            state.critic_target_params, next_subj, next_action
        )
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        y = jax.lax.stop_gradient(
            batch.reward
            + self.discount_factor
            * not_done
            * (q_target - self._alpha(state) * next_log_prob)
        )
        q1, q2 = self.critic_network.q_both(critic_params, subj, batch.action)
        # Sum of both MSEs / 2 (reference twin_critic_action_value_loss,
        # critic_utils.py:160-206).
        return (jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)) / 2.0

    def post_update(self, state: ActorCriticState, batch):
        if state.extra is None:
            return state, {}
        k = jax.random.fold_in(state.key, 1)
        subj = self.history_summarizer.forward(state.summarizer_params, batch.state)
        low, high = self.action_space.low, self.action_space.high
        _, log_prob = self.actor.sample_action(
            state.actor_params, subj, k, low, high
        )
        target_entropy = self._target_entropy()

        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha) * jax.lax.stop_gradient(log_prob + target_entropy)
            )

        loss, grad = jax.value_and_grad(alpha_loss_fn)(state.extra.log_alpha)
        if self.pmean_axis:
            # Keep alpha replicas bit-identical under data parallelism, like
            # the actor/critic grads (actor_critic_base.py pmean_axis).
            grad = jax.lax.pmean(grad, self.pmean_axis)
        updates, opt_state = self.alpha_optimizer().update(
            grad, state.extra.opt_state, state.extra.log_alpha
        )
        log_alpha = optax.apply_updates(state.extra.log_alpha, updates)
        return (
            state.replace(extra=AlphaState(log_alpha=log_alpha, opt_state=opt_state)),
            {"alpha": jnp.exp(log_alpha)},
        )
