"""Discrete-action Soft Actor-Critic (reference:
pearl/policy_learners/sequential_decision_making/soft_actor_critic.py:106-324).

Semantics preserved:
- Twin critic over (state, action-representation) pairs + target critic.
- Critic target: y = r + gamma(1-d) * sum_a' pi(a'|s')(min Q_target(s',a') -
  alpha log pi(a'|s')) — the expected (not sampled) soft value (:183-248).
- Actor loss: sum_a pi(a|s)(alpha log pi(a|s) - min Q(s,a)) (:250-289).
- Temperature auto-tuned via a log-alpha parameter toward target entropy
  -0.89 * log(1/|A|) (:119-143,153-181).
- Actor LR decays exponentially (gamma=0.99), stepped on episode reset
  (:113-117,148-151) — implemented with optax.inject_hyperparams; with N
  batched envs the decay exponent advances by (finished episodes)/N.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.actor_networks import VanillaActorNetwork
from pearl_tpu.neural_networks.twin_critic import TwinCritic
from pearl_tpu.policy_learners.exploration_modules.common import PropensityExploration
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
    ActorCriticState,
)
from pearl_tpu.policy_learners.sequential_decision_making.sac_continuous import (
    AlphaState,
)


def twin_q_all(critic: TwinCritic, params, subj, candidates):
    """Evaluate both critic heads for every candidate action: (B, A) x2."""
    if hasattr(critic, "q_all_both"):
        # Multi-head critics (e.g. CNNTwinCritic) score all candidates from
        # the state alone — one forward per member instead of B*A pair rows.
        return critic.q_all_both(params, subj, candidates)
    B, A = candidates.shape[0], candidates.shape[1]
    s_flat = jnp.broadcast_to(subj[:, None, :], (B, A, subj.shape[-1])).reshape(
        B * A, -1
    )
    a_flat = candidates.reshape(B * A, -1)
    q1, q2 = critic.q_both(params, s_flat, a_flat)
    return q1.reshape(B, A), q2.reshape(B, A)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class SoftActorCritic(ActorCriticBase):
    actor_network: Any = VanillaActorNetwork()
    exploration: Any = PropensityExploration()
    entropy_coef: float = 0.1
    entropy_autotune: bool = True
    alpha_learning_rate: float = 3e-4
    actor_lr_decay: float = 0.99

    @property
    def use_critic_target(self) -> bool:
        return True

    def actor_optimizer(self):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.actor_learning_rate, weight_decay=0.01
        )

    def alpha_optimizer(self):
        return optax.adam(self.alpha_learning_rate)

    def _target_entropy(self) -> float:
        import math

        num_actions = self.action_space.n
        return -0.89 * math.log(1.0 / num_actions)

    def init_extra(self, key):
        if not self.entropy_autotune:
            return None
        log_alpha = jnp.log(jnp.float32(self.entropy_coef))
        return AlphaState(
            log_alpha=log_alpha, opt_state=self.alpha_optimizer().init(log_alpha)
        )

    def _alpha(self, state):
        if state.extra is None:
            return jnp.float32(self.entropy_coef)
        return jnp.exp(state.extra.log_alpha)

    def _policy(self, actor_params, subj, candidates, mask):
        probs = self.actor.get_policy_distribution(
            actor_params, subj, candidates, mask
        )
        log_probs = jnp.log(jnp.clip(probs, 1e-8, 1.0))
        return probs, log_probs

    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        B = subj.shape[0]
        candidates = self.represented_candidates(B)
        probs, log_probs = self._policy(
            actor_params, subj, candidates, batch.curr_available_mask
        )
        q1, q2 = twin_q_all(self.critic_network, state.critic_params, subj, candidates)
        q_min = jnp.minimum(q1, q2)
        alpha = self._alpha(state)
        per_state = jnp.sum(probs * (alpha * log_probs - q_min), axis=-1)
        return jnp.mean(per_state)

    def critic_loss(self, state, critic_params, summ_params, batch, subj, next_subj, key):
        B = subj.shape[0]
        candidates = self.represented_candidates(B)
        next_probs, next_log_probs = self._policy(
            state.actor_params, next_subj, candidates, batch.next_available_mask
        )
        q1t, q2t = twin_q_all(
            self.critic_network, state.critic_target_params, next_subj, candidates
        )
        q_min_t = jnp.minimum(q1t, q2t)
        alpha = self._alpha(state)
        soft_v = jnp.sum(next_probs * (q_min_t - alpha * next_log_probs), axis=-1)
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        y = jax.lax.stop_gradient(
            batch.reward + self.discount_factor * not_done * soft_v
        )
        q1_all, q2_all = twin_q_all(self.critic_network, critic_params, subj, candidates)
        from pearl_tpu.neural_networks.common import select_index_last

        # One-hot selects (bit-identical; minor-dim gathers serialize on TPU).
        q1 = select_index_last(q1_all, batch.action_index)
        q2 = select_index_last(q2_all, batch.action_index)
        return (jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)) / 2.0

    def post_update(self, state: ActorCriticState, batch):
        if state.extra is None:
            return state, {}
        subj = self.history_summarizer.forward(state.summarizer_params, batch.state)
        B = subj.shape[0]
        candidates = self.represented_candidates(B)
        probs, log_probs = self._policy(
            state.actor_params, subj, candidates, batch.curr_available_mask
        )
        target_entropy = self._target_entropy()

        def alpha_loss_fn(log_alpha):
            inner = jax.lax.stop_gradient(log_probs + target_entropy)
            return -jnp.mean(jnp.sum(probs * jnp.exp(log_alpha) * inner, axis=-1))

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

    def episode_reset(self, state, done_mask, key):
        """Decay the actor LR on episode boundaries (reference steps an
        ExponentialLR scheduler in `reset`)."""
        opt = state.actor_opt
        if hasattr(opt, "hyperparams"):
            frac = jnp.sum(done_mask.astype(jnp.float32)) / done_mask.shape[0]
            lr = opt.hyperparams["learning_rate"] * self.actor_lr_decay**frac
            hyper = dict(opt.hyperparams)
            hyper["learning_rate"] = lr
            state = state.replace(actor_opt=opt._replace(hyperparams=hyper))
        return super().episode_reset(state, done_mask, key)
