"""DDPG (reference:
pearl/policy_learners/sequential_decision_making/ddpg.py:106-182).

Deterministic tanh actor + twin critic, both with targets; actor maximizes
Q1(s, mu(s)) (:106-121); critic regresses the clipped double-Q Bellman target
from the target actor (:123-157); default exploration is Gaussian action
noise NormalDistributionExploration(0, 0.1)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.actor_networks import VanillaContinuousActorNetwork
from pearl_tpu.policy_learners.exploration_modules.common import (
    NormalDistributionExploration,
)
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DeepDeterministicPolicyGradient(ActorCriticBase):
    actor_network: Any = VanillaContinuousActorNetwork()
    exploration: Any = NormalDistributionExploration(mean=0.0, std_dev=0.1)
    actor_soft_update_tau: float = 0.005
    critic_soft_update_tau: float = 0.005

    @property
    def use_actor_target(self) -> bool:
        return True

    @property
    def use_critic_target(self) -> bool:
        return True

    def _next_action(self, state, next_subj, key):
        low, high = self.action_space.low, self.action_space.high
        return self.actor.action(state.actor_target_params, next_subj, low, high)

    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        low, high = self.action_space.low, self.action_space.high
        action = self.actor.action(actor_params, subj, low, high)
        q1, _ = self.critic_network.q_both(state.critic_params, subj, action)
        return -jnp.mean(q1)

    def critic_loss(self, state, critic_params, summ_params, batch, subj, next_subj, key):
        next_action = self._next_action(state, next_subj, key)
        q_target = self.critic_network.q_min(
            state.critic_target_params, next_subj, next_action
        )
        not_done = 1.0 - batch.terminated.astype(jnp.float32)
        y = jax.lax.stop_gradient(
            batch.reward + self.discount_factor * not_done * q_target
        )
        q1, q2 = self.critic_network.q_both(critic_params, subj, batch.action)
        return (jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)) / 2.0
