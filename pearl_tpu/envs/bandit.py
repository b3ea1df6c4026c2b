"""Contextual-bandit environments (reference:
pearl/utils/instantiations/environments/contextual_bandit_*.py and
pearl/user_envs/envs/bandit.py).

Bandit envs are single-step episodes: every `step` returns terminated=True
and the auto-reset machinery of VectorEnv provides the next context, so the
standard agent loop needs no special casing. Each step's `info` carries the
instantaneous regret for benchmark evaluation (reference `get_regret`,
contextual_bandit_linear_synthetic_environment.py:158-190)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxSpace, DiscreteActionSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


@struct.dataclass
class CBState:
    context: jnp.ndarray  # (obs_dim,)


@dataclasses.dataclass(frozen=True, eq=False)
class LinearSyntheticBanditEnvironment(Environment):
    """Linear reward with Gaussian noise over [context; arm_feature]
    (reference contextual_bandit_linear_synthetic_environment.py:25-190)."""

    observation_dim: int = 4
    arm_feature_dim: int = 4
    num_arms: int = 5
    reward_noise_sigma: float = 0.1
    seed: int = 0

    def __post_init__(self):
        rng = np.random.RandomState(self.seed)
        object.__setattr__(
            self,
            "_arm_features",
            jnp.asarray(
                rng.uniform(-1, 1, (self.num_arms, self.arm_feature_dim)),
                jnp.float32,
            ),
        )
        object.__setattr__(
            self,
            "_linear_mapping",
            jnp.asarray(
                rng.uniform(-1, 1, (self.observation_dim + self.arm_feature_dim,)),
                jnp.float32,
            ),
        )

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.create(self._arm_features)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(
            -jnp.ones(self.observation_dim), jnp.ones(self.observation_dim)
        )

    def _mean_rewards(self, context: jnp.ndarray) -> jnp.ndarray:
        feats = jnp.concatenate(
            [
                jnp.broadcast_to(
                    context[None, :], (self.num_arms, self.observation_dim)
                ),
                self._arm_features,
            ],
            axis=-1,
        )
        return feats @ self._linear_mapping

    def reset(self, key: PRNGKey) -> Tuple[CBState, jnp.ndarray]:
        context = jax.random.uniform(key, (self.observation_dim,), minval=-1, maxval=1)
        return CBState(context=context), context

    def step(self, state: CBState, action, key: PRNGKey) -> Tuple[CBState, ActionResult]:
        k_noise, k_ctx = jax.random.split(key)
        means = self._mean_rewards(state.context)
        # The stored discrete action vector is the ARM FEATURE row; recover the
        # index by feature matching (same trick as the reference's
        # DynamicActionActorNetwork index recovery).
        diffs = jnp.sum((self._arm_features - jnp.reshape(action, (1, -1))) ** 2, -1)
        idx = jnp.argmin(diffs)
        reward = means[idx] + self.reward_noise_sigma * jax.random.normal(k_noise)
        regret = jnp.max(means) - means[idx]
        new_context = jax.random.uniform(
            k_ctx, (self.observation_dim,), minval=-1, maxval=1
        )
        result = ActionResult(
            observation=new_context,
            reward=reward,
            terminated=jnp.ones((), bool),
            truncated=jnp.zeros((), bool),
            info={"regret": regret},
        )
        return CBState(context=new_context), result


@dataclasses.dataclass(frozen=True, eq=False)
class RewardIsTenTimesActionMABEnvironment(Environment):
    """reward = 10 * action index (reference
    reward_is_equal_to_ten_times_action_multi_arm_bandit_environment.py:24-58)."""

    num_arms: int = 4

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(self.num_arms)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(jnp.zeros(1), jnp.ones(1))

    def reset(self, key: PRNGKey):
        return CBState(context=jnp.zeros((1,))), jnp.zeros((1,))

    def step(self, state, action, key):
        idx = jnp.reshape(action, (-1,))[0]
        result = ActionResult(
            observation=jnp.zeros((1,)),
            reward=10.0 * idx,
            terminated=jnp.ones((), bool),
            truncated=jnp.zeros((), bool),
        )
        return state, result


@dataclasses.dataclass(frozen=True, eq=False)
class ClassificationBanditEnvironment(Environment):
    """Supervised-learning-to-CB conversion: contexts are dataset rows, arms
    are classes, reward 1 iff the chosen class is the label (reference
    SLCBEnvironment over UCI datasets,
    contextual_bandit_uci_environment.py:24-197; datasets are provided as
    local arrays since this build has no network egress)."""

    features: np.ndarray = None  # (N, d)
    labels: np.ndarray = None  # (N,) int
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "_X", jnp.asarray(self.features, jnp.float32))
        object.__setattr__(self, "_y", jnp.asarray(self.labels, jnp.int32))
        object.__setattr__(self, "_num_classes", int(np.max(self.labels)) + 1)

    @property
    def action_space(self) -> DiscreteActionSpace:
        return DiscreteActionSpace.discrete(self._num_classes)

    @property
    def observation_space(self) -> BoxSpace:
        d = self._X.shape[1]
        return BoxSpace.create(-jnp.inf * jnp.ones(d), jnp.inf * jnp.ones(d))

    def reset(self, key: PRNGKey):
        idx = jax.random.randint(key, (), 0, self._X.shape[0])
        return (
            _SLCBState(row=idx),
            self._X[idx],
        )

    def step(self, state, action, key):
        chosen = jnp.reshape(action, (-1,))[0].astype(jnp.int32)
        correct = (chosen == self._y[state.row]).astype(jnp.float32)
        next_row = jax.random.randint(key, (), 0, self._X.shape[0])
        result = ActionResult(
            observation=self._X[next_row],
            reward=correct,
            terminated=jnp.ones((), bool),
            truncated=jnp.zeros((), bool),
            info={"regret": 1.0 - correct},
        )
        return _SLCBState(row=next_row), result


@struct.dataclass
class _SLCBState:
    row: jnp.ndarray
