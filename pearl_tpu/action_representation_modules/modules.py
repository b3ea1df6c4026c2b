"""Action representation modules (reference: pearl/action_representation_modules/).

All three reference representations are fixed (parameterless) transforms, so
each is a frozen dataclass with a pure `apply`. `apply` operates on raw stored
action vectors (for gym-style discrete spaces these are length-1 index
vectors, matching what the reference's DiscreteActionSpace holds —
see SURVEY.md §2.9).
"""

from __future__ import annotations

import abc
import dataclasses

import jax
import jax.numpy as jnp


class ActionRepresentationModule(abc.ABC):
    @abc.abstractmethod
    def apply(self, action: jnp.ndarray) -> jnp.ndarray:
        """(..., a) -> (..., r)."""

    @abc.abstractmethod
    def representation_dim(self, action_dim: int, max_number_actions: int) -> int:
        ...

    def resolve(self, action_dim: int, max_number_actions: int) -> "ActionRepresentationModule":
        """Return a copy with any space-dependent fields filled in (the
        reference resolves these from the action space at PolicyLearner
        construction, policy_learner.py:59-97)."""
        return self


@dataclasses.dataclass(frozen=True)
class IdentityActionRepresentation(ActionRepresentationModule):
    """Passthrough (reference identity_action_representation_module.py:18-73)."""

    def apply(self, action):
        return action

    def representation_dim(self, action_dim, max_number_actions):
        return action_dim


@dataclasses.dataclass(frozen=True)
class OneHotActionRepresentation(ActionRepresentationModule):
    """One-hot of the action index (reference
    one_hot_action_representation_module.py:19-71)."""

    max_number_actions: int = 0  # resolved by the learner if left 0

    def resolve(self, action_dim, max_number_actions):
        if action_dim != 1:
            raise ValueError(
                "OneHotActionRepresentation one-hots the stored action value, "
                "which is only meaningful for index-valued action spaces "
                f"(action_dim=1); this space has action_dim={action_dim} "
                "(embedding-valued elements). Use "
                "IdentityActionRepresentation to feed the embeddings to the "
                "networks directly (the reference does the same in its "
                "recommender-system tutorial)."
            )
        if self.max_number_actions:
            return self
        return dataclasses.replace(self, max_number_actions=max_number_actions)

    def apply(self, action):
        idx = action[..., 0].astype(jnp.int32)
        return jax.nn.one_hot(idx, self.max_number_actions)

    def representation_dim(self, action_dim, max_number_actions):
        del action_dim
        n = self.max_number_actions or max_number_actions
        return n


@dataclasses.dataclass(frozen=True)
class BinaryActionRepresentation(ActionRepresentationModule):
    """Binary (bit) encoding of the action index (reference
    binary_action_representation_module.py:18-76)."""

    bits: int = 0

    def resolve(self, action_dim, max_number_actions):
        if action_dim != 1:
            raise ValueError(
                "BinaryActionRepresentation bit-encodes the stored action "
                "value, which is only meaningful for index-valued action "
                f"spaces (action_dim=1); this space has action_dim="
                f"{action_dim}. Use IdentityActionRepresentation instead."
            )
        if self.bits:
            return self
        import math

        nbits = max(1, math.ceil(math.log2(max(max_number_actions, 2))))
        return dataclasses.replace(self, bits=nbits)

    def apply(self, action):
        idx = action[..., 0].astype(jnp.int32)
        nbits = self.bits if self.bits else 8
        shifts = jnp.arange(nbits, dtype=jnp.int32)
        return ((idx[..., None] >> shifts) & 1).astype(jnp.float32)

    def representation_dim(self, action_dim, max_number_actions):
        del action_dim
        return self.bits if self.bits else 8
