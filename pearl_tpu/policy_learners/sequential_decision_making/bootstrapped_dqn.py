"""Bootstrapped DQN with deep exploration (reference:
pearl/policy_learners/sequential_decision_making/bootstrapped_dqn.py:106-157).

Semantics preserved:
- K Q-heads with additive frozen random priors (EnsembleQValueNetwork).
- Per-member double-DQN loss, weighted by the per-transition Bernoulli
  bootstrap mask from BootstrapReplayBuffer, summed over members (:106-152).
- Acting is greedy w.r.t. ONE ensemble member per env, persistent within an
  episode, resampled on episode end (DeepExploration; :154-157).

TPU-native: all K members evaluate in one vmapped pass; the frozen prior
params live OUTSIDE the optimizer state so AdamW weight decay cannot erode
them.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.neural_networks.q_value_networks import EnsembleQValueNetwork
from pearl_tpu.policy_learners.exploration_modules.common import masked_argmax
from pearl_tpu.policy_learners.exploration_modules.deep_exploration import (
    DeepExploration,
)
from pearl_tpu.policy_learners.policy_learner import ActionChoice
from pearl_tpu.policy_learners.sequential_decision_making.deep_td import (
    DeepTDLearning,
    DeepTDState,
)
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class BootstrappedDQNState(DeepTDState):
    prior_params: Any = None  # frozen random-prior params, never optimized


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class BootstrappedDQN(DeepTDLearning):
    q_network: EnsembleQValueNetwork = EnsembleQValueNetwork(ensemble_size=10)
    exploration: Any = None  # defaults to DeepExploration(ensemble_size)

    def _exploration(self):
        return self.exploration or DeepExploration(
            ensemble_size=self.q_network.ensemble_size
        )

    def init(self, key, observation_dim, action_space, num_envs):
        subj_dim, rep_dim, num_actions = self.dims(observation_dim, action_space)
        k_q, k_s = jax.random.split(key)
        full = self.q_network.init(k_q, subj_dim, rep_dim, num_actions)
        summ_params = self.history_summarizer.init_params(k_s, observation_dim, rep_dim)
        opt_state = self.optimizer().init({"q": full["train"], "summ": summ_params})
        return BootstrappedDQNState(
            params=full["train"],
            target_params=full["train"],
            summarizer_params=summ_params,
            opt_state=opt_state,
            explore_state=self._exploration().init(num_envs),
            step=jnp.zeros((), jnp.int32),
            prior_params=full["prior"],
        )

    def _full(self, train_params, state):
        return {"train": train_params, "prior": state.prior_params}

    def act(self, state, subjective_state, mask, key, exploit: bool = False):
        B = subjective_state.shape[0]
        candidates = self.represented_candidates(B)
        full, subjective_state, candidates = self._act_cast(
            self._full(state.params, state), subjective_state, candidates
        )
        q_ens = self.q_network.q_ensemble(
            full, subjective_state, candidates, mask
        ).astype(jnp.float32)  # (B, K, A)
        exploit_index = self.greedy_index(jnp.mean(q_ens, axis=1), mask, key)
        if exploit:
            index = exploit_index
            explore_state = state.explore_state
        else:
            explore_state, index = self._exploration().act(
                state.explore_state, q_ens, exploit_index, mask, key
            )
        action = self.action_space.elements[index]
        return (
            state.replace(explore_state=explore_state),
            ActionChoice(action=action, index=index),
        )

    def episode_reset(self, state, done_mask, key):
        return state.replace(
            explore_state=self._exploration().reset(state.explore_state, done_mask, key)
        )

    def learn_batch(self, state: BootstrappedDQNState, batch: TransitionBatch):
        gamma = self.discount_factor
        K = self.q_network.ensemble_size
        boot_mask = (
            batch.bootstrap_mask
            if batch.bootstrap_mask is not None
            else jnp.ones((batch.reward.shape[0], K))
        )

        def loss_fn(trainable):
            subj = self.history_summarizer.forward(trainable["summ"], batch.state)
            next_subj = jax.lax.stop_gradient(
                self.history_summarizer.forward(trainable["summ"], batch.next_state)
            )
            B = subj.shape[0]
            candidates = self.represented_candidates(B)
            full = self._full(trainable["q"], state)
            q_ens = self.q_network.q_ensemble(
                full, subj, candidates, batch.curr_available_mask
            )  # (B, K, A)
            q_sa = jnp.take_along_axis(
                q_ens, batch.action_index[:, None, None], axis=2
            )[:, :, 0]  # (B, K)

            # Per-member double DQN: argmax under the online member, value
            # under the target member (bootstrapped_dqn.py:106-152).
            next_online = self.q_network.q_ensemble(
                full, next_subj, candidates, batch.next_available_mask
            )
            if batch.next_available_mask is not None:
                next_online = jnp.where(
                    batch.next_available_mask[:, None, :], next_online, -jnp.inf
                )
            a_star = jnp.argmax(next_online, axis=2)  # (B, K)
            next_target = self.q_network.q_ensemble(
                self._full(state.target_params, state),
                next_subj,
                candidates,
                batch.next_available_mask,
            )
            next_v = jnp.take_along_axis(next_target, a_star[:, :, None], axis=2)[
                :, :, 0
            ]  # (B, K)
            not_done = 1.0 - batch.terminated.astype(jnp.float32)
            target = jax.lax.stop_gradient(
                batch.reward[:, None] + gamma * not_done[:, None] * next_v
            )
            td = (q_sa - target) * boot_mask
            # Mean over batch within each member, summed over members.
            per_member = jnp.sum(td**2, axis=0) / jnp.maximum(
                jnp.sum(boot_mask, axis=0), 1.0
            )
            loss = jnp.sum(per_member)
            return loss, {"loss": jnp.mean(jnp.abs(td)),
                          "per_sample_td": jnp.mean(jnp.abs(td), axis=1)}

        return self._apply_gradients(state, loss_fn)
