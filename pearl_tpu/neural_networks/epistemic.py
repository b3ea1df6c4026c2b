"""Epistemic neural networks (reference:
pearl/neural_networks/common/epistemic_neural_networks.py).

- `MLPWithPrior`: trainable net + frozen random prior scaled additively
  (:51-84). The ensemble variant lives in
  q_value_networks.EnsembleQValueNetwork (stacked + vmapped).
- `Epinet` (:140-271, Osband et al. "Epistemic Neural Networks"): a trainable
  epinet over concat(stop_grad(features), z) plus a frozen priornet ensemble
  weighted by the index vector z ~ N(0, I_index_dim).

Params layout: {"train": ..., "prior": ...}; "prior" must be excluded from
optimization (same convention as EnsembleQValueNetwork)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.common import MLP


@dataclasses.dataclass(frozen=True)
class MLPWithPrior:
    hidden_dims: Sequence[int] = (64, 64)
    output_dim: int = 1
    prior_scale: float = 0.3

    def _net(self):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.output_dim)

    def init(self, key, input_dim: int):
        k1, k2 = jax.random.split(key)
        x0 = jnp.zeros((1, input_dim))
        return {
            "train": self._net().init(k1, x0)["params"],
            "prior": self._net().init(k2, x0)["params"],
        }

    def apply(self, params, x):
        base = self._net().apply({"params": params["train"]}, x)
        prior = self._net().apply({"params": params["prior"]}, x)
        return base + self.prior_scale * jax.lax.stop_gradient(prior)


class _EpinetMLP(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int

    @nn.compact
    def __call__(self, x):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.output_dim)(x)


@dataclasses.dataclass(frozen=True)
class Epinet:
    index_dim: int = 8
    hidden_dims: Sequence[int] = (64,)
    output_dim: int = 1
    num_prior_nets: int = 8  # priornet ensemble size == index_dim typically
    prior_scale: float = 0.3

    def _epinet(self):
        # Output is (output_dim * index_dim), contracted with z.
        return _EpinetMLP(tuple(self.hidden_dims), self.output_dim * self.index_dim)

    def _prior(self):
        return _EpinetMLP((16,), self.output_dim)

    def init(self, key, feature_dim: int):
        k1, k2 = jax.random.split(key)
        x0 = jnp.zeros((1, feature_dim + self.index_dim))
        f0 = jnp.zeros((1, feature_dim))

        def one_prior(k):
            return self._prior().init(k, f0)["params"]

        return {
            "train": self._epinet().init(k1, x0)["params"],
            "prior": jax.vmap(one_prior)(jax.random.split(k2, self.index_dim)),
        }

    def sample_index(self, key) -> jnp.ndarray:
        return jax.random.normal(key, (self.index_dim,))

    def apply(self, params, features, z):
        """features (B, f) [stop-gradded inside], z (index_dim,) -> (B, out).

        epinet(sg[x] ++ z) reshaped (B, out, index) @ z + prior ensemble
        weighted by z (reference :207-271)."""
        B = features.shape[0]
        sg = jax.lax.stop_gradient(features)
        zb = jnp.broadcast_to(z[None, :], (B, self.index_dim))
        out = self._epinet().apply(
            {"params": params["train"]}, jnp.concatenate([features, zb], axis=-1)
        )
        out = out.reshape(B, self.output_dim, self.index_dim) @ z

        prior_outs = jax.vmap(
            lambda p: self._prior().apply({"params": p}, sg)
        )(params["prior"])  # (index_dim, B, out)
        prior = jnp.einsum("k,kbo->bo", z, prior_outs)
        return out + self.prior_scale * jax.lax.stop_gradient(prior)
