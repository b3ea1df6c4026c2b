"""Twin critic (reference: pearl/neural_networks/sequential_decision_making/twin_critic.py).

The reference holds two critic networks in an nn.ModuleList and loops; here
the two critics are ONE set of stacked params evaluated with `vmap`, so both
Q heads come out of a single batched matmul pass.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.q_value_networks import _PairQNet


@dataclasses.dataclass(frozen=True)
class TwinCritic:
    hidden_dims: Sequence[int] = (64, 64)

    def _module(self):
        return _PairQNet(hidden_dims=tuple(self.hidden_dims))

    def init(self, key, state_dim: int, action_dim: int):
        m = self._module()
        s0, a0 = jnp.zeros((1, state_dim)), jnp.zeros((1, action_dim))

        def one(k):
            return m.init(k, s0, a0)["params"]

        return jax.vmap(one)(jax.random.split(key, 2))

    def q_both(self, params, state, action):
        """(q1, q2), each (B,)."""
        m = self._module()
        q = jax.vmap(lambda p: m.apply({"params": p}, state, action)[..., 0])(params)
        return q[0], q[1]

    def q_min(self, params, state, action):
        q1, q2 = self.q_both(params, state, action)
        return jnp.minimum(q1, q2)
