"""Safety module base + identity (reference: pearl/safety_modules/safety_module.py:22-53,
identity_safety_module.py:22-56).

Protocol:
    init(key, observation_dim, action_space, num_envs) -> SafetyState
    filter_action(state, subjective_state, mask) -> mask'       (act-time)
    learn_batch(state, batch, learner=, learner_state=)
        -> (state', metrics)                                    (train-time)

Risk-sensitive variants additionally map quantile distributions to scores
(see risk_sensitive.py); the RC (reward-constrained) module preprocesses
rewards with a learned cost penalty (reward_constrained.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=False)
class SafetyModule:
    def init(self, key, observation_dim: int, action_space, num_envs: int):
        return ()

    def filter_action(
        self, state, subjective_state: jnp.ndarray, mask: Optional[jnp.ndarray]
    ) -> Optional[jnp.ndarray]:
        return mask

    def learn_batch(self, state, batch, learner=None, learner_state=None):
        return state, {}


@dataclasses.dataclass(frozen=True, eq=False)
class IdentitySafetyModule(SafetyModule):
    """No-op safety module — the default for non-distributional learners."""
