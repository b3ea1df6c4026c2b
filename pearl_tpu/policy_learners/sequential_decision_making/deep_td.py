"""Deep TD-learning family: DQN, Double DQN, SARSA (reference:
pearl/policy_learners/sequential_decision_making/deep_td_learning.py,
deep_q_learning.py, double_dqn.py, deep_sarsa.py).

Semantics preserved:
- Bellman target r + gamma * (1 - terminated) * next_values
  (deep_td_learning.py:313-318); MSE loss; optional CQL penalty
  `conservative_alpha * (logsumexp_a Q(s,a) - Q(s, a_taken))`
  (loss_fn_utils.py:18-72) when `is_conservative`.
- Target network soft-updated every `target_update_freq` learn_batch calls
  with `soft_update_tau` (deep_td_learning.py:283-291).
- Reported "loss" is the mean |TD error|, not the optimized MSE
  (deep_td_learning.py:358-361).
- Unavailable next actions are masked to -inf before the max
  (deep_q_learning.py:131-168).

TPU-native shape: one jitted loss over the whole batch; candidate actions are
the fixed represented set broadcast to (B, A, r); the summarizer (if learned)
is part of the trainable pytree and optimized jointly, matching the reference
adding summarizer params to the learner optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pearl_tpu.neural_networks.common import select_index_last
from flax import struct

from pearl_tpu.api.types import PRNGKey
from pearl_tpu.neural_networks.q_value_networks import VanillaQValueNetwork
from pearl_tpu.policy_learners.exploration_modules.common import (
    EGreedyExploration,
    ExplorationModule,
    masked_argmax,
)
from pearl_tpu.action_representation_modules import (
    ActionRepresentationModule,
    OneHotActionRepresentation,
)
from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.utils.pytree import soft_update


@struct.dataclass
class DeepTDState:
    params: Any
    target_params: Any
    summarizer_params: Any
    opt_state: Any
    explore_state: Any
    step: jnp.ndarray  # i32 learn_batch counter


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DeepTDLearning(PolicyLearner):
    """Shared base (reference deep_td_learning.py:201-478)."""

    q_network: Any = VanillaQValueNetwork()
    exploration: ExplorationModule = EGreedyExploration(epsilon=0.05)
    action_representation: ActionRepresentationModule = OneHotActionRepresentation()
    learning_rate: float = 1e-3
    weight_decay: float = 0.01  # torch AdamW default used by the reference
    discount_factor: float = 0.99
    training_rounds: int = 10
    batch_size: int = 128
    target_update_freq: int = 10
    soft_update_tau: float = 0.75
    is_conservative: bool = False
    conservative_alpha: float = 2.0
    # When set (e.g. "data"), gradients are pmean'd over that mesh axis inside
    # learn_batch — the data-parallel learner synchronization described in
    # SURVEY.md §2.11 (replacing the reference's vestigial torch.distributed
    # all_reduce). Only meaningful inside shard_map/pjit over a Mesh.
    pmean_axis: Optional[str] = None
    # Act-path mixed precision (e.g. "bfloat16"): the acting forward pass is
    # the dominant HBM traffic of the fused step at large num_envs
    # (docs/DESIGN.md §4 step-cost decomposition — activations of the act-path
    # MLP at B=131k). When set, `act` casts params + inputs to this dtype so
    # activations halve and the MXU takes bf16 inputs; scores return as f32
    # for exploration/argmax. Learning (learn_batch) stays full f32 — the
    # Bellman targets and gradients are untouched. Opt-in; greedy argmax is
    # robust to bf16 rounding except at near-ties (tested in
    # tests/test_act_dtype.py).
    act_dtype: Optional[str] = None

    def optimizer(self):
        return optax.adamw(self.learning_rate, weight_decay=self.weight_decay)

    def init(self, key: PRNGKey, observation_dim: int, action_space, num_envs: int):
        subj_dim, rep_dim, num_actions = self.dims(observation_dim, action_space)
        k_q, k_s = jax.random.split(key)
        params = self.q_network.init(k_q, subj_dim, rep_dim, num_actions)
        summ_params = self.history_summarizer.init_params(k_s, observation_dim, rep_dim)
        opt_state = self.optimizer().init({"q": params, "summ": summ_params})
        return DeepTDState(
            params=params,
            target_params=params,
            summarizer_params=summ_params,
            opt_state=opt_state,
            explore_state=self.exploration.init(num_envs),
            step=jnp.zeros((), jnp.int32),
        )

    # --- acting ------------------------------------------------------------
    def _act_cast(self, params, *arrays):
        """Apply act-path mixed precision: cast params + input arrays to
        `act_dtype` (no-op when unset). EVERY overriding act/score path must
        route its forward inputs through this helper so `act_dtype` is never
        a silent no-op (QR-DQN quantiles, BootstrappedDQN ensemble)."""
        if self.act_dtype is None:
            return (params,) + arrays
        dt = jnp.dtype(self.act_dtype)
        params = jax.tree.map(lambda x: x.astype(dt), params)
        return (params,) + tuple(a.astype(dt) for a in arrays)

    def _scores(self, state, subjective_state, candidates, mask):
        """Action scores used for greedy selection and exploration."""
        params, subjective_state, candidates = self._act_cast(
            state.params, subjective_state, candidates
        )
        q = self.q_network.q_all(params, subjective_state, candidates, mask)
        return q.astype(jnp.float32)

    def act(self, state, subjective_state, mask, key, exploit: bool = False):
        B = subjective_state.shape[0]
        candidates = self.represented_candidates(B)
        scores = self._scores(state, subjective_state, candidates, mask)
        exploit_index = self.greedy_index(scores, mask, key)
        if exploit:
            index = exploit_index
            explore_state = state.explore_state
        else:
            explore_state, index = self.exploration.act(
                state.explore_state, scores, exploit_index, mask, key
            )
        action = self.action_space.elements[index]
        return (
            state.replace(explore_state=explore_state),
            ActionChoice(action=action, index=index),
        )

    # --- learning ----------------------------------------------------------
    def _next_state_values(
        self, params, target_params, summ_params, batch: TransitionBatch
    ) -> jnp.ndarray:
        """DQN default: max over target-net Q of next available actions."""
        next_subj = self.history_summarizer.forward(summ_params, batch.next_state)
        B = next_subj.shape[0]
        candidates = self.represented_candidates(B)
        q_next = self.q_network.q_all(
            target_params, next_subj, candidates, batch.next_available_mask
        )
        if batch.next_available_mask is not None:
            q_next = jnp.where(batch.next_available_mask, q_next, -jnp.inf)
        return jnp.max(q_next, axis=-1)

    def learn_batch(self, state: DeepTDState, batch: TransitionBatch):
        gamma = self.discount_factor

        def loss_fn(trainable):
            subj = self.history_summarizer.forward(trainable["summ"], batch.state)
            B = subj.shape[0]
            candidates = self.represented_candidates(B)
            q_all = self.q_network.q_all(
                trainable["q"], subj, candidates, batch.curr_available_mask
            )
            # One-hot select (bit-identical): take_along_axis on the
            # minor dim serializes row-wise on TPU (common.py
            # select_index_last).
            q_sa = select_index_last(q_all, batch.action_index)
            next_v = jax.lax.stop_gradient(
                self._next_state_values(
                    trainable["q"], state.target_params, trainable["summ"], batch
                )
            )
            target = batch.reward + gamma * (1.0 - batch.terminated.astype(jnp.float32)) * next_v
            td_error = q_sa - target
            w = batch.weight if batch.weight is not None else jnp.ones_like(td_error)
            loss = jnp.sum(w * td_error**2) / jnp.maximum(jnp.sum(w), 1e-8)
            if self.is_conservative:
                # CQL: logsumexp over available actions minus Q of taken action
                # (loss_fn_utils.py:18-72).
                masked_q = (
                    jnp.where(batch.curr_available_mask, q_all, -jnp.inf)
                    if batch.curr_available_mask is not None
                    else q_all
                )
                cql = jnp.mean(jax.scipy.special.logsumexp(masked_q, axis=-1) - q_sa)
                loss = loss + self.conservative_alpha * cql
            return loss, {"loss": jnp.mean(jnp.abs(td_error)),
                          "per_sample_td": jnp.abs(td_error)}

        return self._apply_gradients(state, loss_fn)

    def _apply_gradients(self, state: DeepTDState, loss_fn):
        """Shared tail of every TD learn_batch: grad -> (optional pmean) ->
        optimizer -> periodic soft target update (deep_td_learning.py:283-291,
        334-361)."""
        trainable = {"q": state.params, "summ": state.summarizer_params}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        if not isinstance(aux, dict):
            aux = {"loss": aux}
        if self.pmean_axis is not None:
            grads = jax.lax.pmean(grads, self.pmean_axis)
            # Scalar metrics sync across devices; per-sample TD stays local
            # (each device owns its replay shard's priorities).
            aux = {
                k: (jax.lax.pmean(v, self.pmean_axis) if v.ndim == 0 else v)
                for k, v in aux.items()
            }
        updates, opt_state = self.optimizer().update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        step = state.step + 1
        do_update = (step % self.target_update_freq) == 0
        target_params = jax.tree.map(
            lambda t, s: jnp.where(
                do_update, t + self.soft_update_tau * (s - t), t
            ),
            state.target_params,
            trainable["q"],
        )
        new_state = state.replace(
            params=trainable["q"],
            summarizer_params=trainable["summ"],
            opt_state=opt_state,
            target_params=target_params,
            step=step,
        )
        return new_state, aux

    def episode_reset(self, state, done_mask, key):
        return state.replace(
            explore_state=self.exploration.reset(state.explore_state, done_mask, key)
        )


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DeepQLearning(DeepTDLearning):
    """Vanilla DQN (reference deep_q_learning.py:41-190)."""


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DoubleDQN(DeepTDLearning):
    """Double DQN (reference double_dqn.py:30-58): argmax under the online
    net, value under the target net."""

    def _next_state_values(self, params, target_params, summ_params, batch):
        next_subj = self.history_summarizer.forward(summ_params, batch.next_state)
        B = next_subj.shape[0]
        candidates = self.represented_candidates(B)
        q_online = self.q_network.q_all(
            params, next_subj, candidates, batch.next_available_mask
        )
        best = masked_argmax(q_online, batch.next_available_mask)
        q_target = self.q_network.q_all(
            target_params, next_subj, candidates, batch.next_available_mask
        )
        return select_index_last(q_target, best)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DeepSARSA(DeepTDLearning):
    """On-policy deep SARSA (reference deep_sarsa.py:59-98): next value is the
    target-net Q of the action actually committed next; requires a
    SARSAReplayBuffer so `next_action` is recorded."""

    @property
    def on_policy(self) -> bool:
        return True

    def _next_state_values(self, params, target_params, summ_params, batch):
        next_subj = self.history_summarizer.forward(summ_params, batch.next_state)
        B = next_subj.shape[0]
        candidates = self.represented_candidates(B)
        q_next = self.q_network.q_all(
            target_params, next_subj, candidates, batch.next_available_mask
        )
        return select_index_last(q_next, batch.next_action_index)
