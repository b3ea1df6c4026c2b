"""State-value networks (reference: pearl/neural_networks/common/value_networks.py)."""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pearl_tpu.neural_networks.common import MLP, ConvNet


class _ValueNet(nn.Module):
    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, state):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1)(state)[..., 0]


@dataclasses.dataclass(frozen=True)
class VanillaValueNetwork:
    """MLP V(s) (reference value_networks.py:27-82)."""

    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int):
        m = _ValueNet(tuple(self.hidden_dims))
        return m.init(key, jnp.zeros((1, state_dim)))["params"]

    def value(self, params, state):
        m = _ValueNet(tuple(self.hidden_dims))
        return m.apply({"params": params}, state)


class _CNNValueNet(nn.Module):
    conv: ConvNet
    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, state):
        feat = self.conv(state)
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1)(feat)[..., 0]


@dataclasses.dataclass(frozen=True)
class CNNValueNetwork:
    """Conv -> flatten -> MLP V(s) over NHWC images, inputs normalized by 255
    (reference CNNValueNetwork, value_networks.py:85-147)."""

    input_shape: Tuple[int, int, int] = (84, 84, 4)
    out_channels: Sequence[int] = (16, 32)
    kernel_sizes: Sequence[int] = (8, 4)
    strides: Sequence[int] = (4, 2)
    paddings: Sequence[int] = (0, 0)
    hidden_dims: Sequence[int] = (128,)

    def _module(self):
        conv = ConvNet(
            out_channels=tuple(self.out_channels),
            kernel_sizes=tuple(self.kernel_sizes),
            strides=tuple(self.strides),
            paddings=tuple(self.paddings),
        )
        return _CNNValueNet(conv, tuple(self.hidden_dims))

    def init(self, key, state_dim: int):
        del state_dim
        m = self._module()
        return m.init(key, jnp.zeros((1,) + tuple(self.input_shape)))["params"]

    def value(self, params, state):
        m = self._module()
        imgs = state.reshape((state.shape[0],) + tuple(self.input_shape))
        return m.apply({"params": params}, imgs)
