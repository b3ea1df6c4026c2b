"""Reward-constrained safety (RCPO) (reference:
pearl/safety_modules/reward_constrained_safety_module.py:35-212).

Semantics preserved:
- A twin cost-critic Q_c is trained on `batch.cost` toward the cost-Bellman
  target with cost discount gamma_c, taking the MAX of the twin targets (the
  pessimistic choice for constraints) (:114-161).
- The Lagrange multiplier follows
  lambda <- clip(lambda + lr * (E[Q_c] * (1 - gamma_c) - constraint),
  [0, upper_bound]) (:163-199).
- The policy learner sees reward - lambda * cost via the agent's
  batch_transform hook (reference couples through
  actor_critic_base.preprocess_batch:377-383).

Works with continuous AND discrete actor-critic learners (the next-action
for the cost Bellman target comes from the learner's actor, like the
reference which reads the policy from the injected policy_learner; discrete
policies feed the cost critic one-hot action representations, matching the
reference's RCSAC/RCPPO/RCREINFORCE rows which pair the module with
OneHotActionTensorRepresentationModule)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.twin_critic import TwinCritic
from pearl_tpu.safety_modules.identity import SafetyModule


@struct.dataclass
class RCSafetyState:
    critic_params: Any
    critic_target_params: Any
    critic_opt: Any
    lagrangian: jnp.ndarray
    key: Any


@dataclasses.dataclass(frozen=True, eq=False)
class RCSafetyModuleCostCriticContinuousAction(SafetyModule):
    constraint_value: float = 0.1
    lambda_constraint_ub_value: float = 20.0
    lr_lambda: float = 1e-2
    cost_discount_factor: float = 0.5
    critic_learning_rate: float = 1e-3
    critic_soft_update_tau: float = 0.005
    critic_hidden_dims: tuple = (64, 64)
    batch_size: int = 256
    # Mesh axis name for data parallelism: cost-critic grads and the lambda
    # drive signal are pmean'd so safety replicas stay bit-identical (set by
    # online_learning(mesh=...), like the learners' pmean_axis).
    pmean_axis: Any = None

    def _critic(self) -> TwinCritic:
        return TwinCritic(hidden_dims=tuple(self.critic_hidden_dims))

    def optimizer(self):
        return optax.adamw(self.critic_learning_rate, weight_decay=0.01)

    def init(self, key, observation_dim: int, action_space, num_envs: int):
        # Discrete learners feed the cost critic one-hot action
        # representations (the reference pairs its discrete RC methods —
        # RCSAC/RCPPO/RCREINFORCE_method_const_0_2,
        # benchmark_config.py:1003-1070 — with
        # OneHotActionTensorRepresentationModule), so the action input dim is
        # the number of actions, not the raw action_dim.
        a_dim = (
            action_space.action_dim
            if action_space.is_continuous
            else action_space.n
        )
        params = self._critic().init(key, observation_dim, a_dim)
        return RCSafetyState(
            critic_params=params,
            critic_target_params=params,
            critic_opt=self.optimizer().init(params),
            lagrangian=jnp.zeros(()),
            key=jax.random.fold_in(key, 1),
        )

    def batch_transform(self, state: RCSafetyState):
        lam = state.lagrangian

        def transform(batch):
            if batch.cost is None:
                return batch
            return batch.replace(reward=batch.reward - lam * batch.cost)

        return transform

    def _policy_action(self, learner, learner_state, subj, key, mask=None):
        """Sample an action from the learner's CURRENT policy at the given
        subjective states (reference :127-142 and :146-153 both query
        `policy_learner._actor.sample_action`)."""
        if learner.is_continuous:
            low, high = learner.action_space.low, learner.action_space.high
            action, _ = learner.actor.sample_action(
                learner_state.actor_params, subj, key, low, high
            )
            return action
        # Discrete policy: sample from the policy distribution over one-hot
        # candidates; the cost critic consumes one-hot representations (see
        # init).
        B = subj.shape[0]
        candidates = learner.represented_candidates(B)
        probs = learner.actor.get_policy_distribution(
            learner_state.actor_params, subj, candidates, mask
        )
        idx = jax.random.categorical(key, jnp.log(jnp.clip(probs, 1e-8, 1.0)), axis=-1)
        return jnp.take_along_axis(
            candidates,
            jnp.broadcast_to(idx[:, None, None], (B, 1, candidates.shape[-1])),
            axis=1,
        )[:, 0]

    def _update_from_batch(self, state, batch, learner, learner_state):
        """One cost-critic + lambda update from a TransitionBatch — shared by
        the online `learn` (sampled from replay, reference :114-132) and the
        offline `learn_batch` path."""
        if batch.cost is None:
            return state, {}
        critic = self._critic()
        k_next_act, k_lam_act, k_new = jax.random.split(state.key, 3)

        next_subj = learner.history_summarizer.forward(
            learner_state.summarizer_params, batch.next_state
        )
        next_action = self._policy_action(
            learner, learner_state, next_subj, k_next_act, batch.next_available_mask
        )
        if learner.is_continuous:
            batch_action = batch.action
        else:
            B = batch.reward.shape[0]
            candidates = learner.represented_candidates(B)
            batch_action = jnp.take_along_axis(
                candidates,
                jnp.broadcast_to(
                    batch.action_index[:, None, None], (B, 1, candidates.shape[-1])
                ),
                axis=1,
            )[:, 0]
        q1t, q2t = critic.q_both(state.critic_target_params, next_subj, next_action)
        # Clipped double-Q: MIN of the twin targets for the cost-Bellman
        # target (reference cost_critic_learn_batch :180-196).
        q_target = jnp.minimum(q1t, q2t)
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        y = jax.lax.stop_gradient(
            batch.cost + self.cost_discount_factor * not_done * q_target
        )
        subj = learner.history_summarizer.forward(
            learner_state.summarizer_params, batch.state
        )

        def loss_fn(params):
            q1, q2 = critic.q_both(params, subj, batch_action)
            return (jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)) / 2.0

        loss, grads = jax.value_and_grad(loss_fn)(state.critic_params)
        if self.pmean_axis is not None:
            grads = jax.lax.pmean(grads, self.pmean_axis)
        updates, opt = self.optimizer().update(
            grads, state.critic_opt, state.critic_params
        )
        params = optax.apply_updates(state.critic_params, updates)
        target = jax.tree.map(
            lambda t, s: t + self.critic_soft_update_tau * (s - t),
            state.critic_target_params,
            params,
        )

        # Lambda update on the MAX-twin cost estimate of the current policy's
        # action at the batch states — pessimistic for constraints (reference
        # constraint_lambda_update :136-160).
        a_pi = self._policy_action(
            learner, learner_state, subj, k_lam_act, batch.curr_available_mask
        )
        q1, q2 = critic.q_both(params, subj, a_pi)
        cost_q = jnp.mean(jnp.maximum(q1, q2))
        if self.pmean_axis is not None:
            cost_q = jax.lax.pmean(cost_q, self.pmean_axis)
        lam = jnp.clip(
            state.lagrangian
            + self.lr_lambda
            * (cost_q * (1.0 - self.cost_discount_factor) - self.constraint_value),
            0.0,
            self.lambda_constraint_ub_value,
        )
        return (
            RCSafetyState(
                critic_params=params,
                critic_target_params=target,
                critic_opt=opt,
                lagrangian=lam,
                key=k_new,
            ),
            {"cost_critic_loss": loss, "lambda": lam},
        )

    def learn(self, state, buffer, buffer_state, key, learner, learner_state):
        batch = buffer.sample(buffer_state, key, self.batch_size)
        return self._update_from_batch(state, batch, learner, learner_state)

    def learn_batch(self, state, batch, learner=None, learner_state=None):
        """Offline RC training (goes beyond the reference, whose learn_batch
        is a stub, reference :221-228): train the cost critic and lambda from
        the given batch so `PearlAgent.learn_batch` drives real constraint
        learning."""
        if learner is None or learner_state is None:
            return state, {}
        return self._update_from_batch(state, batch, learner, learner_state)
