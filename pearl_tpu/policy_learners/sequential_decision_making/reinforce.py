"""REINFORCE with optional critic baseline (reference:
pearl/policy_learners/sequential_decision_making/reinforce.py:53-231).

Semantics preserved:
- Cumulative discounted returns computed over the whole on-policy rollout,
  bootstrapped from the critic at episode truncation boundaries
  (reinforce.py:180-209 walks the buffer backwards; here a reverse lax.scan).
- Loss: -log pi(a|s) * (G - V(s)) with a stop-gradient baseline
  (reinforce.py:147-168); the critic regresses G.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from pearl_tpu.neural_networks.value_networks import VanillaValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer


def discounted_returns(rewards, next_values, terminated, done, discount):
    """G_t = r_t + gamma (1-term_t) * (V(s'_t) at a rollout/episode boundary,
    else G_{t+1}); (T, B) arrays in, (T, B) out."""
    not_term = 1.0 - terminated.astype(jnp.float32)
    done_f = done.astype(jnp.float32)

    def scan_fn(carry, x):
        r, nt, d, nv = x
        bootstrap = d * nv + (1.0 - d) * carry
        g = r + discount * nt * bootstrap
        return g, g

    # The final transition of the rollout is also a boundary: bootstrap there.
    done_f = done_f.at[-1].set(1.0)
    _, g_rev = jax.lax.scan(
        scan_fn,
        jnp.zeros_like(rewards[0]),
        (rewards[::-1], not_term[::-1], done_f[::-1], next_values[::-1]),
    )
    return g_rev[::-1]


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class REINFORCE(ActorCriticBase):
    critic_network: Any = VanillaValueNetwork()
    training_rounds: int = 1
    batch_size: int = 256

    @property
    def on_policy(self) -> bool:
        return True

    @property
    def use_critic_target(self) -> bool:
        return False

    def learn(self, state, buffer, buffer_state, key, batch_transform=None):
        assert isinstance(buffer, OnPolicyReplayBuffer)
        traj = buffer.trajectory_view(buffer_state)
        if batch_transform is not None:
            # Safety reward shaping (reward -= lambda * cost) before the
            # return computation (reference actor_critic_base.py:371-386).
            traj = batch_transform(traj)
        T, B = traj.reward.shape
        summ = self.history_summarizer
        subj_flat = summ.forward(state.summarizer_params, traj.state.reshape(T * B, -1))
        next_subj_flat = summ.forward(
            state.summarizer_params, traj.next_state.reshape(T * B, -1)
        )
        next_values = self.critic_network.value(
            state.critic_params, next_subj_flat
        ).reshape(T, B)
        returns = discounted_returns(
            traj.reward,
            next_values,
            traj.terminated,
            jnp.logical_or(traj.terminated, traj.truncated),
            self.discount_factor,
        ).reshape(T * B)

        candidates = self.represented_candidates(T * B)
        mask_flat = (
            traj.curr_available_mask.reshape(T * B, -1)
            if traj.curr_available_mask is not None
            else None
        )
        action_index_flat = traj.action_index.reshape(T * B)

        stored_flat = traj.state.reshape(T * B, -1)

        def actor_loss_fn(actor_params, summ_params):
            subj_g = summ.forward(summ_params, stored_flat)
            probs = self.actor.get_policy_distribution(
                actor_params, subj_g, candidates, mask_flat
            )
            from pearl_tpu.neural_networks.common import select_index_last

            # One-hot select — take_along_axis on the minor dim serializes
            # on TPU (see select_index_last; measured on PPO's twin of this
            # full-trajectory selection).
            logp = jnp.log(
                jnp.clip(
                    select_index_last(probs, action_index_flat), 1e-8, 1.0
                )
            )
            baseline = jax.lax.stop_gradient(
                self.critic_network.value(state.critic_params, subj_flat)
            )
            return -jnp.mean(logp * (returns - baseline))

        def critic_loss_fn(critic_params, summ_params):
            subj_g = summ.forward(summ_params, stored_flat)
            v = self.critic_network.value(critic_params, subj_g)
            return jnp.mean((v - returns) ** 2)

        a_loss, (a_grads, a_summ) = jax.value_and_grad(actor_loss_fn, argnums=(0, 1))(
            state.actor_params, state.summarizer_params
        )
        c_loss, (c_grads, c_summ) = jax.value_and_grad(critic_loss_fn, argnums=(0, 1))(
            state.critic_params, state.summarizer_params
        )
        summ_grads = jax.tree.map(jnp.add, a_summ, c_summ)
        if self.pmean_axis:
            a_grads, c_grads, summ_grads = jax.lax.pmean(
                (a_grads, c_grads, summ_grads), self.pmean_axis
            )
        a_up, actor_opt = self.actor_optimizer().update(
            a_grads, state.actor_opt, state.actor_params
        )
        c_up, critic_opt = self.critic_optimizer().update(
            c_grads, state.critic_opt, state.critic_params
        )
        s_up, summ_opt = self.summ_optimizer().update(
            summ_grads, state.summ_opt, state.summarizer_params
        )
        state = state.replace(
            actor_params=optax.apply_updates(state.actor_params, a_up),
            critic_params=optax.apply_updates(state.critic_params, c_up),
            summarizer_params=optax.apply_updates(state.summarizer_params, s_up),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            summ_opt=summ_opt,
            step=state.step + 1,
        )
        return state, buffer_state, {"actor_loss": a_loss, "critic_loss": c_loss}

    def learn_batch(self, state, batch):
        raise NotImplementedError("REINFORCE learns from whole rollouts via learn()")
