"""Actor networks (reference: pearl/neural_networks/sequential_decision_making/actor_networks.py).

Discrete actors expose:
    init(key, state_dim, action_dim, num_actions) -> params
    logits(params, state, actions, mask) -> (B, A)   (unavailable -> -inf)
    get_policy_distribution(params, state, actions, mask) -> probs (B, A)

Continuous actors expose:
    init(key, state_dim, action_dim) -> params
    sample_action(params, state, key) -> (action (B, d), log_prob (B,))
    (deterministic actors return log_prob = zeros)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.common import MLP

LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0
_EPS = 1e-6


def action_scaling(low, high, normalized_action):
    """Map [-1, 1]^d -> [low, high]^d (reference actor_networks.py:30-60)."""
    return low + (normalized_action + 1.0) * 0.5 * (high - low)


def action_unscaling(low, high, action):
    return (action - low) / (high - low) * 2.0 - 1.0


def noise_scaling(low, high, noise):
    """Scale noise in [-1,1] units to action-range units (reference :63-87)."""
    return noise * (high - low) / 2.0


class _LogitsNet(nn.Module):
    hidden_dims: Sequence[int]
    num_actions: int

    @nn.compact
    def __call__(self, state):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.num_actions)(state)


@dataclasses.dataclass(frozen=True)
class VanillaActorNetwork:
    """Softmax policy over a fixed action set (reference actor_networks.py:108-177)."""

    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del action_dim
        m = _LogitsNet(tuple(self.hidden_dims), num_actions)
        return m.init(key, jnp.zeros((1, state_dim)))["params"]

    def logits(self, params, state, actions, mask=None):
        num_actions = actions.shape[1]
        m = _LogitsNet(tuple(self.hidden_dims), num_actions)
        raw = m.apply({"params": params}, state)
        if mask is not None:
            raw = jnp.where(mask, raw, -jnp.inf)
        return raw

    def get_policy_distribution(self, params, state, actions, mask=None):
        return jax.nn.softmax(self.logits(params, state, actions, mask), axis=-1)


class _PairScoreNet(nn.Module):
    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1)(x)


@dataclasses.dataclass(frozen=True)
class DynamicActionActorNetwork:
    """Scores each (state, action-representation) pair, softmax over available
    actions (reference DynamicActionActorNetwork, actor_networks.py:306-446).
    Works with dynamic action spaces because logits come from action features,
    not fixed heads."""

    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del num_actions
        m = _PairScoreNet(tuple(self.hidden_dims))
        return m.init(key, jnp.zeros((1, state_dim + action_dim)))["params"]

    def logits(self, params, state, actions, mask=None):
        B, A = actions.shape[0], actions.shape[1]
        m = _PairScoreNet(tuple(self.hidden_dims))
        s_rep = jnp.broadcast_to(state[:, None, :], (B, A, state.shape[-1]))
        x = jnp.concatenate([s_rep, actions], axis=-1).reshape(B * A, -1)
        raw = m.apply({"params": params}, x).reshape(B, A)
        if mask is not None:
            raw = jnp.where(mask, raw, -jnp.inf)
        return raw

    def get_policy_distribution(self, params, state, actions, mask=None):
        return jax.nn.softmax(self.logits(params, state, actions, mask), axis=-1)


class _CNNLogitsNet(nn.Module):
    conv: "nn.Module"
    hidden_dims: Sequence[int]
    num_actions: int

    @nn.compact
    def __call__(self, state):
        feat = self.conv(state)
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.num_actions)(feat)


@dataclasses.dataclass(frozen=True)
class CNNActorNetwork:
    """Softmax policy over image observations (reference CNNActorNetwork,
    actor_networks.py:180-303). Flattened image states are reshaped to
    `input_shape` NHWC internally."""

    input_shape: tuple = (84, 84, 4)
    out_channels: Sequence[int] = (16, 32)
    kernel_sizes: Sequence[int] = (8, 4)
    strides: Sequence[int] = (4, 2)
    paddings: Sequence[int] = (0, 0)
    hidden_dims: Sequence[int] = (128,)

    def _module(self, num_actions):
        from pearl_tpu.neural_networks.common import ConvNet

        conv = ConvNet(
            out_channels=tuple(self.out_channels),
            kernel_sizes=tuple(self.kernel_sizes),
            strides=tuple(self.strides),
            paddings=tuple(self.paddings),
        )
        return _CNNLogitsNet(conv, tuple(self.hidden_dims), num_actions)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del state_dim, action_dim
        m = self._module(num_actions)
        return m.init(key, jnp.zeros((1,) + tuple(self.input_shape)))["params"]

    def logits(self, params, state, actions, mask=None):
        num_actions = actions.shape[1]
        m = self._module(num_actions)
        imgs = state.reshape((state.shape[0],) + tuple(self.input_shape))
        raw = m.apply({"params": params}, imgs)
        if mask is not None:
            raw = jnp.where(mask, raw, -jnp.inf)
        return raw

    def get_policy_distribution(self, params, state, actions, mask=None):
        return jax.nn.softmax(self.logits(params, state, actions, mask), axis=-1)


class _DeterministicNet(nn.Module):
    hidden_dims: Sequence[int]
    action_dim: int

    @nn.compact
    def __call__(self, state):
        return MLP(
            hidden_dims=tuple(self.hidden_dims),
            output_dim=self.action_dim,
            last_activation="tanh",
        )(state)


@dataclasses.dataclass(frozen=True)
class VanillaContinuousActorNetwork:
    """Deterministic tanh actor scaled into the action box (reference
    VanillaContinuousActorNetwork, actor_networks.py:449-486)."""

    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int, action_dim: int):
        m = _DeterministicNet(tuple(self.hidden_dims), action_dim)
        return m.init(key, jnp.zeros((1, state_dim)))["params"]

    def action(self, params, state, low, high):
        action_dim = low.shape[-1]
        m = _DeterministicNet(tuple(self.hidden_dims), action_dim)
        normalized = m.apply({"params": params}, state)
        return action_scaling(low, high, normalized)

    def sample_action(self, params, state, key, low, high):
        del key
        a = self.action(params, state, low, high)
        return a, jnp.zeros(a.shape[:-1])


class _GaussianHeads(nn.Module):
    hidden_dims: Sequence[int]
    action_dim: int

    @nn.compact
    def __call__(self, state):
        feat = MLP(
            hidden_dims=tuple(self.hidden_dims[:-1]),
            output_dim=self.hidden_dims[-1],
            last_activation="relu",
        )(state)
        mu = nn.Dense(self.action_dim, name="mu")(feat)
        log_std = nn.Dense(self.action_dim, name="log_std")(feat)
        # Smoothly clamp log-std into [LOG_STD_MIN, LOG_STD_MAX] (reference
        # GaussianActorNetwork, actor_networks.py:489-630).
        log_std = LOG_STD_MIN + 0.5 * (LOG_STD_MAX - LOG_STD_MIN) * (
            jnp.tanh(log_std) + 1.0
        )
        return mu, log_std


@dataclasses.dataclass(frozen=True)
class GaussianActorNetwork:
    """Tanh-squashed Gaussian actor with log-prob Jacobian correction
    (reference actor_networks.py:489-630)."""

    hidden_dims: Sequence[int] = (64, 64)

    def _module(self, action_dim):
        return _GaussianHeads(tuple(self.hidden_dims), action_dim)

    def init(self, key, state_dim: int, action_dim: int):
        m = self._module(action_dim)
        return m.init(key, jnp.zeros((1, state_dim)))["params"]

    def _dist(self, params, state, action_dim):
        return self._module(action_dim).apply({"params": params}, state)

    def sample_action(self, params, state, key, low, high):
        action_dim = low.shape[-1]
        mu, log_std = self._dist(params, state, action_dim)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mu.shape)
        pre_tanh = mu + std * eps
        squashed = jnp.tanh(pre_tanh)
        action = action_scaling(low, high, squashed)
        log_prob = self._log_prob_from_pre_tanh(mu, log_std, pre_tanh, low, high)
        return action, log_prob

    def mean_action(self, params, state, low, high):
        action_dim = low.shape[-1]
        mu, _ = self._dist(params, state, action_dim)
        return action_scaling(low, high, jnp.tanh(mu))

    def get_log_probability(self, params, state, action, low, high):
        """log pi(a|s) via atanh recovery (reference `get_log_probability`)."""
        action_dim = low.shape[-1]
        mu, log_std = self._dist(params, state, action_dim)
        squashed = jnp.clip(action_unscaling(low, high, action), -1 + _EPS, 1 - _EPS)
        pre_tanh = jnp.arctanh(squashed)
        return self._log_prob_from_pre_tanh(mu, log_std, pre_tanh, low, high)

    @staticmethod
    def _log_prob_from_pre_tanh(mu, log_std, pre_tanh, low, high):
        std = jnp.exp(log_std)
        normal_lp = (
            -0.5 * ((pre_tanh - mu) / std) ** 2
            - log_std
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )
        squashed = jnp.tanh(pre_tanh)
        # d/dx tanh correction + affine scaling into [low, high].
        correction = jnp.log(1.0 - squashed**2 + _EPS) + jnp.log((high - low) / 2.0)
        return jnp.sum(normal_lp - correction, axis=-1)
