"""Environment wrappers (reference: pearl/user_envs/wrappers/ and
pearl/utils/instantiations/environments/environments.py).

- PartialObservabilityWrapper: observe only a subset of features
  (wrappers/partial_observability.py:20-133, CartPole/Pendulum/etc variants
  become index choices).
- SparseRewardWrapper: binarize rewards around a success predicate
  (wrappers/sparse_reward.py:20-100).
- SafetyWrapper: emit cost = 1{risky state-action} in the ActionResult
  (wrappers/safety.py:17-34 emits info["risky_sa"]).
- DynamicActionSpaceWrapper: availability mask that shrinks periodically
  (wrappers/dynamic_action_env.py:19-48).
- OneHotObservationsFromDiscrete: one-hot a discrete observation
  (environments.py:121-168) — FrozenLake builds this in; kept for generic
  discrete-obs envs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


@dataclasses.dataclass(frozen=True, eq=False)
class EnvWrapper(Environment):
    env: Environment = None

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def max_episode_steps(self):
        return self.env.max_episode_steps

    def reset(self, key: PRNGKey):
        return self.env.reset(key)

    def step(self, state, action, key: PRNGKey):
        return self.env.step(state, action, key)


@dataclasses.dataclass(frozen=True, eq=False)
class PartialObservabilityWrapper(EnvWrapper):
    """Expose only `observed_indices` of the observation. The reference ships
    per-env variants (PartialObservableCartPole keeps positions, hides
    velocities, etc.); here the indices are data:
        CartPole:   (0, 2)  — positions only
        Pendulum:   (0, 1)  — angle only
        MountainCar:(0,)    — position only
        Acrobot:    (0, 1, 2, 3) — angles only
    """

    observed_indices: Sequence[int] = (0,)

    @property
    def observation_space(self):
        base = self.env.observation_space
        idx = jnp.asarray(self.observed_indices)
        return BoxSpace.create(base.low[idx], base.high[idx])

    def _project(self, obs):
        return obs[..., jnp.asarray(self.observed_indices)]

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._project(obs)

    def step(self, state, action, key):
        state, result = self.env.step(state, action, key)
        return state, result.replace(observation=self._project(result.observation))


@dataclasses.dataclass(frozen=True, eq=False)
class SparseRewardWrapper(EnvWrapper):
    """reward = 1 if success_fn(observation) else 0 (reference
    wrappers/sparse_reward.py; e.g. Pendulum: success = cos(theta) > 0.98)."""

    success_fn: Callable[[jnp.ndarray], jnp.ndarray] = None

    def step(self, state, action, key):
        state, result = self.env.step(state, action, key)
        success = self.success_fn(result.observation)
        return state, result.replace(reward=success.astype(jnp.float32))


@dataclasses.dataclass(frozen=True, eq=False)
class SafetyWrapper(EnvWrapper):
    """Emit cost = 1 when the state-action is risky (reference
    wrappers/safety.py emits info["risky_sa"]; the cost flows into
    ActionResult.cost so RC safety modules can learn from it).

    When `noisy_reward_sigma > 0`, a risky step additionally adds a
    high-variance reward `N(noisy_reward_mean, noisy_reward_sigma)` — the
    reference's PuckWorldSafetyWrapper semantics (safety.py:26-34: small
    positive mean, large variance in the risky half-plane), used by the
    variance-sensitive safety experiments."""

    risky_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None
    noisy_reward_sigma: float = 0.0
    noisy_reward_mean: float = 0.01

    def step(self, state, action, key):
        k_env, k_noise = jax.random.split(key)
        state, result = self.env.step(state, action, k_env)
        risky = self.risky_fn(result.observation, action).astype(jnp.float32)
        info = dict(result.info)
        info["risky_sa"] = risky
        reward = result.reward
        if self.noisy_reward_sigma > 0.0:
            bonus = self.noisy_reward_mean + self.noisy_reward_sigma * (
                jax.random.normal(k_noise, ())
            )
            reward = reward + risky * bonus
        return state, result.replace(cost=risky, info=info, reward=reward)


@dataclasses.dataclass(frozen=True, eq=False)
class DynamicActionSpaceWrapper(EnvWrapper):
    """Shrink the available-action set periodically (reference
    wrappers/dynamic_action_env.py:19-48): on steps where
    (t // interval) is odd, the last `num_masked` actions are unavailable."""

    interval: int = 4
    num_masked: int = 1

    def _mask(self, t):
        n = self.env.action_space.n
        ids = jnp.arange(n)
        shrunk = ((t // self.interval) % 2) == 1
        full = jnp.ones((n,), bool)
        reduced = ids < (n - self.num_masked)
        return jnp.where(shrunk, reduced, full)

    def step(self, state, action, key):
        new_state, result = self.env.step(state, action, key)
        t = new_state.t if hasattr(new_state, "t") else jnp.zeros((), jnp.int32)
        return new_state, result.replace(available_actions_mask=self._mask(t))


@dataclasses.dataclass(frozen=True, eq=False)
class FlattenObservations(EnvWrapper):
    """Flatten a pytree/dict observation into one vector (reference
    FlattenDictObservations, environments.py:169-224). Leaves are flattened
    and concatenated in pytree order."""

    flat_dim: int = 0  # total flattened dim (required for observation_space)

    @property
    def observation_space(self):
        import jax.numpy as _jnp

        return BoxSpace.create(
            -_jnp.inf * _jnp.ones(self.flat_dim), _jnp.inf * _jnp.ones(self.flat_dim)
        )

    @staticmethod
    def _flatten(obs):
        import jax

        leaves = jax.tree.leaves(obs)
        return jnp.concatenate([jnp.reshape(l, (-1,)) for l in leaves])

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._flatten(obs)

    def step(self, state, action, key):
        state, result = self.env.step(state, action, key)
        return state, result.replace(observation=self._flatten(result.observation))


@dataclasses.dataclass(frozen=True, eq=False)
class FlattenDictObservations(FlattenObservations):
    """Flatten DICT observations into one vector, reference-faithfully
    (environments.py:169-224): entries concatenate in sorted-key order
    (recursively) — which is exactly JAX's dict pytree leaf order — and the
    flattened observation space derives its bounds from the sub-spaces (Box
    bounds flattened; Discrete(n) contributes [0, n-1]). `flat_dim` may be
    omitted when the wrapped env exposes a dict-of-spaces observation_space."""

    @property
    def observation_space(self):
        if self.flat_dim:
            return super().observation_space
        space = self.env.observation_space
        if not isinstance(space, dict):
            raise ValueError(
                "FlattenDictObservations needs flat_dim when the wrapped "
                "env's observation_space is not a dict of spaces."
            )
        lows, highs = [], []

        def walk(sub):
            # Recurse nested dicts in sorted-key order — the same order
            # JAX's dict pytree flattening (and therefore _flatten) uses.
            if isinstance(sub, dict):
                for _, s in sorted(sub.items()):
                    walk(s)
            elif hasattr(sub, "low"):  # Box
                lows.append(jnp.reshape(sub.low, (-1,)))
                highs.append(jnp.reshape(sub.high, (-1,)))
            elif hasattr(sub, "n"):  # Discrete: a scalar index in [0, n-1]
                lows.append(jnp.zeros((1,)))
                highs.append(jnp.asarray([float(sub.n - 1)]))
            else:
                raise NotImplementedError(f"Unsupported subspace {type(sub)}")

        walk(space)
        return BoxSpace.create(jnp.concatenate(lows), jnp.concatenate(highs))


@dataclasses.dataclass(frozen=True, eq=False)
class OneHotObservationsFromDiscrete(EnvWrapper):
    """One-hot a scalar discrete observation (reference environments.py:121-168)."""

    num_values: int = 0  # 0 = infer from a DiscreteSpace observation space

    @property
    def _n(self) -> int:
        n = self.num_values or getattr(self.env.observation_space, "n", 0)
        if not n:
            raise ValueError(
                "OneHotObservationsFromDiscrete needs `num_values` (the "
                "wrapped env's observation space is not discrete, so the "
                "number of values cannot be inferred)."
            )
        return n

    @property
    def observation_space(self):
        return BoxSpace.create(jnp.zeros(self._n), jnp.ones(self._n))

    def _one_hot(self, obs):
        idx = jnp.reshape(obs, (-1,))[0].astype(jnp.int32)
        return jnp.zeros((self._n,)).at[idx].set(1.0)

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._one_hot(obs)

    def step(self, state, action, key):
        state, result = self.env.step(state, action, key)
        return state, result.replace(observation=self._one_hot(result.observation))
