"""Policy learner base (reference: pearl/policy_learners/policy_learner.py:41-230).

A learner is a frozen-dataclass config owning its exploration module, action
representation module, and history summarization module (same composition as
the reference). Its state is a flax.struct pytree. Contract:

    init(key, observation_dim, action_space, num_envs) -> LearnerState
    act(state, subjective_state, mask, key, exploit) -> (state', ActionChoice)
    learn_batch(state, batch) -> (state', metrics)
    learn(state, buffer, buffer_state, key) -> (state', metrics)
    episode_reset(state, done_mask, key) -> state'

`learn` is the reference's `training_rounds x {sample -> preprocess ->
learn_batch}` loop (policy_learner.py:163-196) compiled as one `lax.scan`.
Every LearnerState carries `summarizer_params` so the agent can compute the
act-time subjective state from the history window.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.action_representation_modules import (
    ActionRepresentationModule,
    IdentityActionRepresentation,
)
from pearl_tpu.api.types import PRNGKey
from pearl_tpu.history_summarization_modules import (
    HistorySummarizationModule,
    IdentityHistorySummarization,
)
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class ActionChoice:
    """The output of `act`: the raw action vector for the env/replay plus the
    action index for discrete spaces (0 placeholder for continuous)."""

    action: jnp.ndarray  # (B, a)
    index: jnp.ndarray  # (B,) i32


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class PolicyLearner(abc.ABC):
    training_rounds: int = 100
    batch_size: int = 1
    action_representation: ActionRepresentationModule = IdentityActionRepresentation()
    history_summarizer: HistorySummarizationModule = IdentityHistorySummarization()
    # Bound by the agent at construction via `dataclasses.replace` (the
    # reference resolves space-dependent defaults the same way at
    # PolicyLearner.__init__, policy_learner.py:59-97).
    action_space: Any = None
    # Greedy-argmax tie handling on the act path (reference
    # TiebreakingStrategy, common/tiebreaking_strategy.py:13-16 +
    # action_utils.get_model_action_index_batch): NO (first index, the
    # deterministic default), PER_ROW (independent randomization per env),
    # BATCH (one shared random column permutation). Strategies other than NO
    # draw from a fold_in of the act key, so configuring them does not shift
    # the exploration RNG stream.
    tiebreaking: Any = None  # None == TiebreakingStrategy.NO_TIEBREAKING

    def bind(self, action_space) -> "PolicyLearner":
        """Return a copy of this config bound to an action space."""
        return dataclasses.replace(self, action_space=action_space)

    # --- static properties -------------------------------------------------
    @property
    def on_policy(self) -> bool:
        return False

    @property
    def is_distributional(self) -> bool:
        return False

    # --- helpers shared by subclasses -------------------------------------
    def resolved_action_representation(self, action_space) -> ActionRepresentationModule:
        if action_space is None:
            raise ValueError(
                "This policy learner is not bound to an action space. Call "
                "`agent.for_env(env)` (or `learner.bind(action_space)`) before "
                "init/act/learn — drivers like `online_learning` do this "
                "automatically."
            )
        num_actions = getattr(action_space, "n", 0)
        action_dim = action_space.action_dim
        return self.action_representation.resolve(action_dim, num_actions)

    def dims(self, observation_dim: int, action_space) -> Tuple[int, int, int]:
        """(subjective_dim, action_repr_dim, num_actions)."""
        num_actions = getattr(action_space, "n", 0)
        rep = self.resolved_action_representation(action_space)
        rep_dim = rep.representation_dim(action_space.action_dim, num_actions)
        subj_dim = self.history_summarizer.subjective_dim(observation_dim, rep_dim)
        return subj_dim, rep_dim, num_actions

    def greedy_index(self, scores, mask, key: Optional[PRNGKey]) -> jnp.ndarray:
        """Greedy action index under this learner's `tiebreaking` strategy.
        The default (None / NO_TIEBREAKING) is a deterministic masked argmax
        and consumes no randomness."""
        from pearl_tpu.policy_learners.exploration_modules.common import (
            TiebreakingStrategy,
            masked_argmax,
            model_action_index,
        )

        if (
            self.tiebreaking is None
            or self.tiebreaking == TiebreakingStrategy.NO_TIEBREAKING
        ):
            return masked_argmax(scores, mask)
        tie_key = jax.random.fold_in(key, 0x7EB)
        return model_action_index(scores, mask, self.tiebreaking, tie_key)

    def represented_candidates(self, batch_size: int) -> jnp.ndarray:
        """All candidate actions under the action representation, broadcast to
        (B, A, r). Representations are fixed transforms, so this is cheap and
        fuses into the surrounding computation."""
        rep = self.resolved_action_representation(self.action_space)
        cand = rep.apply(self.action_space.elements)  # (A, r)
        return jnp.broadcast_to(cand[None], (batch_size,) + cand.shape)

    # --- abstract API ------------------------------------------------------
    @abc.abstractmethod
    def init(self, key: PRNGKey, observation_dim: int, action_space, num_envs: int):
        ...

    @abc.abstractmethod
    def act(
        self,
        state,
        subjective_state: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        key: PRNGKey,
        exploit: bool = False,
    ) -> Tuple[Any, ActionChoice]:
        ...

    @abc.abstractmethod
    def learn_batch(self, state, batch: TransitionBatch):
        ...

    def preprocess_batch(self, state, batch: TransitionBatch) -> TransitionBatch:
        """Hook mirroring the reference's preprocess_batch
        (policy_learner.py:198-219). Summarizer application happens inside
        each learner's loss (so gradients flow); cost-penalty preprocessing is
        applied by actor-critic learners with an RC safety module."""
        return batch

    def learn(self, state, buffer, buffer_state, key: PRNGKey, batch_transform=None):
        """training_rounds x (sample -> learn_batch) as a lax.scan; returns
        (state', buffer_state', metrics).

        `batch_transform` is the safety-module hook: the RC module uses it to
        subtract lambda*cost from rewards before the learner sees the batch
        (reference actor_critic_base.py:371-386). Buffers exposing
        `update_priorities` (prioritized replay) receive per-sample |TD|
        write-backs each round when the learner reports `per_sample_td`."""
        prioritized = hasattr(buffer, "update_priorities")

        def round_fn(carry, k):
            ls, bs = carry
            if prioritized:
                batch, sample_idx = buffer.sample_with_indices(bs, k, self.batch_size)
            else:
                batch = buffer.sample(bs, k, self.batch_size)
            if batch_transform is not None:
                batch = batch_transform(batch)
            batch = self.preprocess_batch(ls, batch)
            ls, metrics = self.learn_batch(ls, batch)
            if prioritized and "per_sample_td" in metrics:
                bs = buffer.update_priorities(bs, sample_idx, metrics["per_sample_td"])
            metrics = {k: v for k, v in metrics.items() if k != "per_sample_td"}
            return (ls, bs), metrics

        keys = jax.random.split(key, self.training_rounds)
        (state, buffer_state), metrics = jax.lax.scan(
            round_fn, (state, buffer_state), keys
        )
        return state, buffer_state, jax.tree.map(jnp.mean, metrics)

    def episode_reset(self, state, done_mask: jnp.ndarray, key: PRNGKey):
        return state
