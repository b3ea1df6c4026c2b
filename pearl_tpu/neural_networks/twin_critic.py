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


@dataclasses.dataclass(frozen=True)
class CNNTwinCritic:
    """Twin multi-head CNN Q critics over image states (the critic shape the
    reference's SAC_Atari / SAC_multi_head_Atari methods use:
    CNNQValueNetwork / CNNQValueMultiHeadNetwork pairs built by make_critic,
    benchmark_config.py:532-597, critic_utils.py:40-78).

    Both members share one conv->MLP architecture evaluated as stacked params
    under `vmap`, and each produces |A| Q-heads from the state alone, so the
    conv runs once per state — not once per (state, candidate action) pair.
    `state` arrives flattened (learners keep everything 2-D) and is reshaped
    to the configured NHWC `input_shape`.
    """

    input_shape: Tuple[int, int, int] = (84, 84, 4)
    out_channels: Sequence[int] = (16, 32)
    kernel_sizes: Sequence[int] = (8, 4)
    strides: Sequence[int] = (4, 2)
    paddings: Sequence[int] = (0, 0)
    hidden_dims: Sequence[int] = (128,)

    def _module(self, num_actions: int):
        from pearl_tpu.neural_networks.common import ConvNet
        from pearl_tpu.neural_networks.q_value_networks import _CNNQNet

        conv = ConvNet(
            out_channels=tuple(self.out_channels),
            kernel_sizes=tuple(self.kernel_sizes),
            strides=tuple(self.strides),
            paddings=tuple(self.paddings),
        )
        return _CNNQNet(conv, tuple(self.hidden_dims), num_actions)

    def init(self, key, state_dim: int, action_dim: int):
        # Discrete SAC passes one-hot action representations, so action_dim
        # is the number of actions (= number of Q heads).
        del state_dim
        m = self._module(action_dim)
        img0 = jnp.zeros((1,) + tuple(self.input_shape))

        def one(k):
            return m.init(k, img0)["params"]

        return jax.vmap(one)(jax.random.split(key, 2))

    def q_all_both(self, params, state, candidates):
        """((B, A), (B, A)) — all candidate-action Q values for both members.

        The fast path `twin_q_all` dispatches to: one conv pass per member
        over B images instead of B*A.
        """
        m = self._module(candidates.shape[1])
        imgs = state.reshape((state.shape[0],) + tuple(self.input_shape))
        q = jax.vmap(lambda p: m.apply({"params": p}, imgs))(params)  # (2, B, A)
        return q[0], q[1]

    def q_both(self, params, state, action):
        """(q1, q2) each (B,) for one-hot `action` rows."""
        B = state.shape[0]
        A = action.shape[-1]
        candidates = jnp.broadcast_to(jnp.eye(A)[None], (B, A, A))
        q1, q2 = self.q_all_both(params, state, candidates)
        return jnp.sum(q1 * action, axis=-1), jnp.sum(q2 * action, axis=-1)

    def q_min(self, params, state, action):
        q1, q2 = self.q_both(params, state, action)
        return jnp.minimum(q1, q2)
