"""Exploration modules (reference: pearl/policy_learners/exploration_modules/).

Functional protocol (batched over B env instances):

    init(num_envs) -> ExploreState (a pytree; () when stateless)
    act(state, scores, exploit_index, mask, key) -> (state', index (B,) i32)
    reset(state, done_mask, key) -> state'   (per-episode hook, default no-op)

`scores` is whatever the learner scores actions with ((B, A) Q-values for
value-based learners, probabilities for propensity exploration);
`exploit_index` the greedy choice. Continuous-action modules instead implement
`act_continuous(state, exploit_action, low, high, key)`.

The reference drives these with Python `random` (e.g.
epsilon_greedy_exploration.py:79-84); here everything is `jax.random` so
exploration jits into the acting step. Curve parity is within-seed-variance,
not bitwise (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import abc
import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey


class ExplorationModule(abc.ABC):
    def init(self, num_envs: int):
        return ()

    def act(self, state, scores, exploit_index, mask, key):
        raise NotImplementedError

    def reset(self, state, done_mask, key):
        return state


def masked_argmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Row-wise argmax treating unavailable actions as -inf (reference
    action_utils.get_model_action_index_batch)."""
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


class TiebreakingStrategy(enum.Enum):
    """Reference common/tiebreaking_strategy.py:13-16 — how greedy argmax
    handles tied scores: first index (NO), independent per-row randomization
    (PER_ROW), or one shared random column permutation for the whole batch
    (BATCH — the reference's fast consistent mode: tied columns resolve to
    the SAME index on every row)."""

    NO_TIEBREAKING = 0
    PER_ROW_TIEBREAKING = 1
    BATCH_TIEBREAKING = 2


def masked_argmax_random_ties(
    scores: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    key: PRNGKey,
    epsilon: float = 0.0,
) -> jnp.ndarray:
    """Argmax with uniform random tie-breaking per row (reference
    TiebreakingStrategy.PER_ROW, common/tiebreaking_strategy.py +
    action_utils.argmax_random_tie_break_per_row). Essential for
    tabular/early-training policies where many Q-values are exactly equal.
    `epsilon` widens the tie to scores >= max - epsilon (the reference
    defaults to 1e-6; 0.0 keeps exact-tie semantics)."""
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    best = jnp.max(scores, axis=-1, keepdims=True)
    is_tie = scores >= best - epsilon
    logits = jnp.where(is_tie, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def masked_argmax_random_ties_batch(
    scores: jnp.ndarray, mask: Optional[jnp.ndarray], key: PRNGKey
) -> jnp.ndarray:
    """Argmax under ONE random column permutation shared by all rows
    (reference action_utils.argmax_random_tie_breaks_batch): columns tied on
    several rows resolve to the same index on each — the reference's
    documented consistency property — at the cost of correlation across
    rows."""
    A = scores.shape[-1]
    perm = jax.random.permutation(key, A)
    permuted = jnp.take(scores, perm, axis=-1)
    pmask = jnp.take(mask, perm, axis=-1) if mask is not None else None
    idx = masked_argmax(permuted, pmask)
    return perm[idx].astype(jnp.int32)


def model_action_index(
    scores: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    strategy: TiebreakingStrategy,
    key: Optional[PRNGKey] = None,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Greedy action-index selection under a tie-breaking strategy
    (reference action_utils.get_model_action_index_batch:130-160). When
    PER_ROW is configured, `epsilon` defaults to the reference
    argmax_random_tie_break_per_row's 1e-6 so near-tied float Q-values are
    randomized like the reference; pass 0.0 for exact-tie-only semantics."""
    if strategy == TiebreakingStrategy.PER_ROW_TIEBREAKING:
        return masked_argmax_random_ties(scores, mask, key, epsilon)
    if strategy == TiebreakingStrategy.BATCH_TIEBREAKING:
        return masked_argmax_random_ties_batch(scores, mask, key)
    return masked_argmax(scores, mask)


def _uniform_index(key, batch, num_actions, mask):
    if mask is None:
        return jax.random.randint(key, (batch,), 0, num_actions, dtype=jnp.int32)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class NoExploration(ExplorationModule):
    """Greedy w.r.t. scores (reference common/no_exploration.py:26-49)."""

    def act(self, state, scores, exploit_index, mask, key):
        return state, exploit_index


@struct.dataclass
class StepCount:
    step: jnp.ndarray  # i32 env-steps seen


@dataclasses.dataclass(frozen=True)
class EGreedyExploration(ExplorationModule):
    """epsilon-greedy with optional linear schedule (reference
    common/epsilon_greedy_exploration.py:24-103): epsilon decays linearly from
    `start_epsilon` to `end_epsilon` over `warmup_steps` env steps."""

    epsilon: float = 0.05
    start_epsilon: Optional[float] = None
    end_epsilon: Optional[float] = None
    warmup_steps: Optional[int] = None

    def init(self, num_envs: int):
        return StepCount(step=jnp.zeros((), jnp.int32))

    def current_epsilon(self, step):
        if self.start_epsilon is None or self.end_epsilon is None or not self.warmup_steps:
            return jnp.float32(self.epsilon)
        frac = jnp.clip(step.astype(jnp.float32) / self.warmup_steps, 0.0, 1.0)
        return self.start_epsilon + frac * (self.end_epsilon - self.start_epsilon)

    def act(self, state, scores, exploit_index, mask, key):
        B, A = scores.shape
        eps = self.current_epsilon(state.step)
        k_bernoulli, k_uniform = jax.random.split(key)
        explore = jax.random.uniform(k_bernoulli, (B,)) < eps
        random_index = _uniform_index(k_uniform, B, A, mask)
        index = jnp.where(explore, random_index, exploit_index)
        return StepCount(step=state.step + B), index


@dataclasses.dataclass(frozen=True)
class BoltzmannExploration(ExplorationModule):
    """Sample from softmax(scores / temperature) over available actions
    (reference common/boltzmann_exploration.py:27-113)."""

    temperature: float = 1.0

    def act(self, state, scores, exploit_index, mask, key):
        logits = scores / self.temperature
        if mask is not None:
            logits = jnp.where(mask, logits, -jnp.inf)
        index = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return state, index


@dataclasses.dataclass(frozen=True)
class PropensityExploration(ExplorationModule):
    """Sample from the policy's own probabilities (reference
    common/propensity_exploration.py:22-42). `scores` are probabilities."""

    def act(self, state, scores, exploit_index, mask, key):
        logits = jnp.log(jnp.maximum(scores, 1e-20))
        if mask is not None:
            logits = jnp.where(mask, logits, -jnp.inf)
        index = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return state, index


@dataclasses.dataclass(frozen=True)
class NormalDistributionExploration(ExplorationModule):
    """Gaussian noise on continuous actions, scaled by the action range and
    clipped to the box (reference common/normal_distribution_exploration.py:25-76)."""

    mean: float = 0.0
    std_dev: float = 0.1

    def act_continuous(self, state, exploit_action, low, high, key):
        noise = self.mean + self.std_dev * jax.random.normal(key, exploit_action.shape)
        scaled = noise * (high - low) / 2.0
        return state, jnp.clip(exploit_action + scaled, low, high)


@dataclasses.dataclass(frozen=True)
class ExplorationModuleWrapper(ExplorationModule):
    """Delegating base for exploration wrappers (reference
    exploration_module_wrapper.py:20-52)."""

    base: ExplorationModule = dataclasses.field(default_factory=NoExploration)

    def init(self, num_envs: int):
        return self.base.init(num_envs)

    def act(self, state, scores, exploit_index, mask, key):
        return self.base.act(state, scores, exploit_index, mask, key)

    def reset(self, state, done_mask, key):
        return self.base.reset(state, done_mask, key)


@dataclasses.dataclass(frozen=True)
class Warmup(ExplorationModule):
    """Uniform-random for the first `warmup_steps` env steps, then delegate
    (reference wrappers/warmup.py:26-60)."""

    base: ExplorationModule = dataclasses.field(default_factory=NoExploration)
    warmup_steps: int = 0

    def init(self, num_envs: int):
        return (StepCount(step=jnp.zeros((), jnp.int32)), self.base.init(num_envs))

    def act(self, state, scores, exploit_index, mask, key):
        count, base_state = state
        B, A = scores.shape
        k_uniform, k_base = jax.random.split(key)
        base_state, base_index = self.base.act(
            base_state, scores, exploit_index, mask, k_base
        )
        random_index = _uniform_index(k_uniform, B, A, mask)
        in_warmup = count.step < self.warmup_steps
        index = jnp.where(in_warmup, random_index, base_index)
        return (StepCount(step=count.step + B), base_state), index

    def reset(self, state, done_mask, key):
        count, base_state = state
        return (count, self.base.reset(base_state, done_mask, key))
