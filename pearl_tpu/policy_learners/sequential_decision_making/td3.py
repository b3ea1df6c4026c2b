"""TD3 and TD3BC (reference:
pearl/policy_learners/sequential_decision_making/td3.py:147-319).

TD3 = DDPG + (a) delayed actor updates every `actor_update_freq`,
(b) target-policy smoothing: clipped Gaussian noise, scaled by the action
range, added to the target actor's next action (:147-202).
TD3BC adds a behavior-cloning MSE with adaptive weight
lambda = alpha / mean|Q1(s, a_batch)| (:242-319) for offline RL."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.actor_networks import noise_scaling
from pearl_tpu.policy_learners.sequential_decision_making.ddpg import (
    DeepDeterministicPolicyGradient,
)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class TD3(DeepDeterministicPolicyGradient):
    actor_update_freq: int = 2
    actor_update_noise: float = 0.2
    actor_update_noise_clip: float = 0.5

    def _next_action(self, state, next_subj, key):
        low, high = self.action_space.low, self.action_space.high
        base = self.actor.action(state.actor_target_params, next_subj, low, high)
        noise = jax.random.normal(key, base.shape) * self.actor_update_noise
        noise = jnp.clip(
            noise, -self.actor_update_noise_clip, self.actor_update_noise_clip
        )
        # Noise is expressed in normalized units and scaled to the action range
        # (reference td3.py:176-189, actor_networks.py:63-87).
        noise = noise_scaling(low, high, noise)
        return jnp.clip(base + noise, low, high)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class TD3BC(TD3):
    behavior_cloning_alpha: float = 2.5

    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        low, high = self.action_space.low, self.action_space.high
        action = self.actor.action(actor_params, subj, low, high)
        q1, _ = self.critic_network.q_both(state.critic_params, subj, action)
        lam = self.behavior_cloning_alpha / (
            jax.lax.stop_gradient(jnp.mean(jnp.abs(q1))) + 1e-8
        )
        bc = jnp.mean(jnp.sum((action - batch.action) ** 2, axis=-1))
        return -lam * jnp.mean(q1) + bc
