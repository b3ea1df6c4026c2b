"""Contextual-bandit exploration modules (reference:
pearl/policy_learners/exploration_modules/contextual_bandits/).

Protocol: bandit learners compute per-arm (mu, sigma) and call
`act_scores(state, mu, sigma, mask, key) -> (state', index)`. This replaces
the reference's pattern of passing the model in as `representation` and
having the exploration module call `calculate_sigma` itself
(ucb_exploration.py:27-120) — same math, explicit dataflow.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.policy_learners.exploration_modules.common import (
    ExplorationModule,
    masked_argmax,
)


class BanditExplorationModule(ExplorationModule):
    def act_scores(self, state, mu, sigma, mask, key):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class UCBExploration(BanditExplorationModule):
    """score = mu + alpha * sigma, argmax (reference ucb_exploration.py:27-120;
    NaN sigmas coerced to 0)."""

    alpha: float = 1.0

    def act_scores(self, state, mu, sigma, mask, key):
        sigma = jnp.nan_to_num(sigma, nan=0.0)
        return state, masked_argmax(mu + self.alpha * sigma, mask)

    def scores(self, mu, sigma):
        return mu + self.alpha * jnp.nan_to_num(sigma, nan=0.0)


@struct.dataclass
class VanillaUCBState:
    action_counts: jnp.ndarray  # (A,)
    total: jnp.ndarray  # scalar


@dataclasses.dataclass(frozen=True)
class VanillaUCBExploration(BanditExplorationModule):
    """Count-based UCB: mu + sqrt(2 log t / n_a) (reference
    ucb_exploration.py:185-271)."""

    num_actions: int = 0

    def init(self, num_envs: int):
        return VanillaUCBState(
            action_counts=jnp.zeros((self.num_actions,)),
            total=jnp.zeros(()),
        )

    def act_scores(self, state, mu, sigma, mask, key):
        t = jnp.maximum(state.total, 1.0)
        bonus = jnp.sqrt(2.0 * jnp.log(t) / jnp.maximum(state.action_counts, 1e-3))
        index = masked_argmax(mu + bonus[None, :], mask)
        counts = state.action_counts.at[index].add(1.0)
        return (
            VanillaUCBState(action_counts=counts, total=state.total + index.shape[0]),
            index,
        )


@dataclasses.dataclass(frozen=True)
class ThompsonSamplingExplorationLinear(BanditExplorationModule):
    """Efficient per-point Thompson sampling: score ~ N(mu, sigma) per arm
    (reference thompson_sampling_exploration.py:25-143, `enable_efficient_
    sampling` path). Coefficient-space sampling lives on LinearRegression.
    sample_coefs for learners that need it."""

    def act_scores(self, state, mu, sigma, mask, key):
        sigma = jnp.nan_to_num(sigma, nan=0.0)
        scores = mu + sigma * jax.random.normal(key, mu.shape)
        return state, masked_argmax(scores, mask)


@dataclasses.dataclass(frozen=True)
class SquareCBExploration(BanditExplorationModule):
    """Inverse-gap weighting (reference squarecb_exploration.py:24-217):
    p_a = 1 / (A + gamma * (max_mu - mu_a)) for non-greedy arms, greedy arm
    gets the remainder; sample from p."""

    gamma: float = 10.0
    clamp_min: Optional[float] = None
    clamp_max: Optional[float] = None

    def _probabilities(self, mu, mask):
        if self.clamp_min is not None or self.clamp_max is not None:
            mu = jnp.clip(
                mu,
                -jnp.inf if self.clamp_min is None else self.clamp_min,
                jnp.inf if self.clamp_max is None else self.clamp_max,
            )
        neg_inf_mu = jnp.where(mask, mu, -jnp.inf) if mask is not None else mu
        best = jnp.max(neg_inf_mu, axis=-1, keepdims=True)
        greedy = neg_inf_mu == best
        A = mu.shape[-1]
        gap = best - mu
        p = 1.0 / (A + self.gamma * gap)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        p = jnp.where(greedy, 0.0, p)
        # Greedy arm takes the remaining mass (squarecb_exploration.py:24-217).
        p_greedy = jnp.maximum(1.0 - jnp.sum(p, axis=-1, keepdims=True), 0.0)
        # Split remainder across ties.
        n_greedy = jnp.sum(greedy, axis=-1, keepdims=True)
        p = jnp.where(greedy, p_greedy / jnp.maximum(n_greedy, 1), p)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def act_scores(self, state, mu, sigma, mask, key):
        p = self._probabilities(mu, mask)
        index = jax.random.categorical(
            key, jnp.log(jnp.maximum(p, 1e-20)), axis=-1
        ).astype(jnp.int32)
        return state, index


@dataclasses.dataclass(frozen=True)
class FastCBExploration(SquareCBExploration):
    """FastCB (reference squarecb_exploration.py:157-217): gap computed on a
    normalized scale via max_mu, sharper exploitation."""

    def _probabilities(self, mu, mask):
        neg_inf_mu = jnp.where(mask, mu, -jnp.inf) if mask is not None else mu
        best = jnp.max(neg_inf_mu, axis=-1, keepdims=True)
        greedy = neg_inf_mu == best
        A = mu.shape[-1]
        safe_best = jnp.maximum(best, 1e-6)
        gap = (best - mu) / safe_best
        p = 1.0 / (A + self.gamma * gap)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        p = jnp.where(greedy, 0.0, p)
        p_greedy = jnp.maximum(1.0 - jnp.sum(p, axis=-1, keepdims=True), 0.0)
        n_greedy = jnp.sum(greedy, axis=-1, keepdims=True)
        p = jnp.where(greedy, p_greedy / jnp.maximum(n_greedy, 1), p)
        return p / jnp.sum(p, axis=-1, keepdims=True)
