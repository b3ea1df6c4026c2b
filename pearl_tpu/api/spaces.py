"""Spaces (reference: pearl/api/space.py, pearl/utils/instantiations/spaces/*).

A space is a small pytree (flax.struct dataclass) whose static fields (counts,
dims) are trace-time constants, so spaces can be closed over by jitted
functions or passed through them. Sampling takes an explicit PRNG key.

Masks are True = available (the complement of the reference's
`unavailable_actions_mask`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import PRNGKey


@struct.dataclass
class DiscreteSpace:
    """A finite set of elements, each a 1-D vector (reference:
    pearl/utils/instantiations/spaces/discrete.py:31-135)."""

    elements: jnp.ndarray  # (n, d)
    n: int = struct.field(pytree_node=False)
    element_dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, elements) -> "DiscreteSpace":
        elements = jnp.asarray(elements)
        if elements.ndim == 1:
            elements = elements[:, None]
        return cls(
            elements=elements.astype(jnp.float32),
            n=int(elements.shape[0]),
            element_dim=int(elements.shape[1]),
        )

    @classmethod
    def range(cls, n: int) -> "DiscreteSpace":
        """The space {0, 1, ..., n-1} as 1-D scalars (gym `Discrete(n)`)."""
        return cls.create(jnp.arange(n, dtype=jnp.float32))

    @property
    def shape(self):
        return (self.n, self.element_dim)

    @property
    def is_continuous(self) -> bool:
        return False

    def sample_index(self, key: PRNGKey, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Uniform index over (masked) elements."""
        if mask is None:
            return jax.random.randint(key, (), 0, self.n)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)

    def sample(self, key: PRNGKey, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.elements[self.sample_index(key, mask)]


@struct.dataclass
class DiscreteActionSpace(DiscreteSpace):
    """Discrete action space (reference:
    pearl/utils/instantiations/spaces/discrete_action.py:33-112)."""

    @property
    def action_dim(self) -> int:
        return self.element_dim

    @property
    def actions_batch(self) -> jnp.ndarray:
        """All actions stacked, shape (n, action_dim) (reference `actions_batch`)."""
        return self.elements

    @classmethod
    def discrete(cls, n: int) -> "DiscreteActionSpace":
        return cls.range(n)


@struct.dataclass
class BoxSpace:
    """Box in R^d (reference: pearl/utils/instantiations/spaces/box.py:32-127)."""

    low: jnp.ndarray  # (d,)
    high: jnp.ndarray  # (d,)
    dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, low, high) -> "BoxSpace":
        low = jnp.atleast_1d(jnp.asarray(low, dtype=jnp.float32))
        high = jnp.atleast_1d(jnp.asarray(high, dtype=jnp.float32))
        return cls(low=low, high=high, dim=int(low.shape[0]))

    @property
    def shape(self):
        return (self.dim,)

    @property
    def is_continuous(self) -> bool:
        return True

    def sample(self, key: PRNGKey, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del mask  # no masking for continuous spaces (reference warns and ignores)
        # Uniform over the box; unbounded dims sample from a standard normal.
        u = jax.random.uniform(key, (self.dim,))
        bounded = jnp.isfinite(self.low) & jnp.isfinite(self.high)
        span_sample = jnp.where(
            bounded,
            self.low + u * (jnp.where(bounded, self.high - self.low, 0.0)),
            jax.random.normal(key, (self.dim,)),
        )
        return span_sample

    def clip(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(x, self.low, self.high)


@struct.dataclass
class BoxActionSpace(BoxSpace):
    """Continuous action space (reference:
    pearl/utils/instantiations/spaces/box_action.py:33-86)."""

    @property
    def action_dim(self) -> int:
        return self.dim
