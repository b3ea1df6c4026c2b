"""Proximal Policy Optimization (reference:
pearl/policy_learners/sequential_decision_making/ppo.py:48-330).

Semantics preserved:
- GAE with trace decay lambda and lambda-returns computed over the whole
  rollout (reference walks the buffer backwards per transition,
  ppo.py:202-294 — here one reverse `lax.scan` over the (T, B) trajectory
  view).
- Action probabilities are FROZEN before the update rounds begin
  (ppo.py:272-294 computes them in preprocess) and used as the ratio
  denominator.
- Clipped-ratio surrogate loss + entropy bonus (ppo.py:153-184); critic
  regresses the lambda-return (ppo.py:186-193).
- On-policy: the agent clears the buffer after learn (pearl_agent.py:219-220).
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


def gae_lambda_returns(
    rewards, values, next_values, terminated, done, discount, lam
):
    """(T, B) inputs -> (advantages, lambda_returns), both (T, B).

    delta_t = r_t + gamma (1-term_t) V(s'_t) - V(s_t)
    A_t = delta_t + gamma * lam * (1-done_t) * A_{t+1}
    done (terminated OR truncated) cuts the trace; terminated alone zeroes the
    bootstrap value.
    """
    not_term = 1.0 - terminated.astype(jnp.float32)
    not_done = 1.0 - done.astype(jnp.float32)
    delta = rewards + discount * not_term * next_values - values

    def scan_fn(carry, x):
        delta_t, nd = x
        adv = delta_t + discount * lam * nd * carry
        return adv, adv

    _, adv_rev = jax.lax.scan(
        scan_fn,
        jnp.zeros_like(delta[0]),
        (delta[::-1], not_done[::-1]),
    )
    advantages = adv_rev[::-1]
    return advantages, advantages + values


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class ProximalPolicyOptimization(ActorCriticBase):
    critic_network: Any = VanillaValueNetwork()
    epsilon: float = 0.2  # clip range
    trace_decay_param: float = 0.95  # GAE lambda
    entropy_bonus_scaling: float = 0.01
    normalize_advantages: bool = True
    training_rounds: int = 10
    batch_size: int = 256

    @property
    def on_policy(self) -> bool:
        return True

    @property
    def use_critic_target(self) -> bool:
        return False

    def learn(self, state, buffer, buffer_state, key, batch_transform=None):
        assert isinstance(buffer, OnPolicyReplayBuffer), (
            "PPO requires an OnPolicyReplayBuffer sized rollout_steps*num_envs"
        )
        traj = buffer.trajectory_view(buffer_state)
        if batch_transform is not None:
            # Safety reward shaping (reward -= lambda * cost) before GAE —
            # the reference applies it in preprocess_batch
            # (actor_critic_base.py:371-386).
            traj = batch_transform(traj)
        T, B = traj.reward.shape

        summ = self.history_summarizer
        subj_flat = summ.forward(
            state.summarizer_params, traj.state.reshape(T * B, -1)
        )
        next_subj_flat = summ.forward(
            state.summarizer_params, traj.next_state.reshape(T * B, -1)
        )
        values = self.critic_network.value(state.critic_params, subj_flat).reshape(T, B)
        next_values = self.critic_network.value(
            state.critic_params, next_subj_flat
        ).reshape(T, B)
        advantages, lam_returns = gae_lambda_returns(
            traj.reward,
            values,
            next_values,
            traj.terminated,
            jnp.logical_or(traj.terminated, traj.truncated),
            self.discount_factor,
            self.trace_decay_param,
        )
        if self.normalize_advantages:
            advantages = (advantages - jnp.mean(advantages)) / (
                jnp.std(advantages) + 1e-8
            )

        # Frozen (pre-update) log-probs — the ratio denominator.
        candidates = self.represented_candidates(T * B)
        mask_flat = (
            traj.curr_available_mask.reshape(T * B, -1)
            if traj.curr_available_mask is not None
            else None
        )
        probs_old = self.actor.get_policy_distribution(
            state.actor_params, subj_flat, candidates, mask_flat
        )
        from pearl_tpu.neural_networks.common import select_index_last

        action_index_flat = traj.action_index.reshape(T * B)
        # One-hot select, NOT take_along_axis: the minor-dim gather
        # serializes on TPU (11.3 ms for these T*B rows — 78% of the whole
        # fused PPO step, round-5 profile; select_index_last docstring).
        logp_old = jnp.log(
            jnp.clip(select_index_last(probs_old, action_index_flat), 1e-8, 1.0)
        )
        data = {
            "stored": traj.state.reshape(T * B, -1),
            "action_index": action_index_flat,
            "advantage": advantages.reshape(T * B),
            "lam_return": lam_returns.reshape(T * B),
            "logp_old": jax.lax.stop_gradient(logp_old),
            "mask": mask_flat,
        }

        def round_fn(ls, k):
            idx = jax.random.randint(k, (self.batch_size,), 0, T * B)
            mb = jax.tree.map(
                lambda x: x[idx] if x is not None else None, data,
                is_leaf=lambda x: x is None,
            )
            ls, metrics = self._update_minibatch(ls, mb)
            return ls, metrics

        keys = jax.random.split(key, self.training_rounds)
        state, metrics = jax.lax.scan(round_fn, state, keys)
        return state, buffer_state, jax.tree.map(jnp.mean, metrics)

    def _update_minibatch(self, state, mb):
        n = mb["stored"].shape[0]
        candidates = self.represented_candidates(n)
        summ = self.history_summarizer

        def actor_loss_fn(actor_params, summ_params):
            subj = summ.forward(summ_params, mb["stored"])
            probs = self.actor.get_policy_distribution(
                actor_params, subj, candidates, mb["mask"]
            )
            from pearl_tpu.neural_networks.common import select_index_last

            logp = jnp.log(
                jnp.clip(
                    select_index_last(probs, mb["action_index"]), 1e-8, 1.0
                )
            )
            ratio = jnp.exp(logp - mb["logp_old"])
            surr1 = ratio * mb["advantage"]
            surr2 = (
                jnp.clip(ratio, 1.0 - self.epsilon, 1.0 + self.epsilon)
                * mb["advantage"]
            )
            entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-8, 1.0)), axis=-1)
            return -jnp.mean(
                jnp.minimum(surr1, surr2)
            ) - self.entropy_bonus_scaling * jnp.mean(entropy)

        def critic_loss_fn(critic_params, summ_params):
            subj = summ.forward(summ_params, mb["stored"])
            v = self.critic_network.value(critic_params, subj)
            return jnp.mean((v - mb["lam_return"]) ** 2)

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
        return (
            state.replace(
                actor_params=optax.apply_updates(state.actor_params, a_up),
                critic_params=optax.apply_updates(state.critic_params, c_up),
                summarizer_params=optax.apply_updates(state.summarizer_params, s_up),
                actor_opt=actor_opt,
                critic_opt=critic_opt,
                summ_opt=summ_opt,
                step=state.step + 1,
            ),
            {"actor_loss": a_loss, "critic_loss": c_loss},
        )

    def learn_batch(self, state, batch):
        raise NotImplementedError("PPO learns from whole rollouts via learn()")
