"""Risk-sensitive safety modules (reference:
pearl/safety_modules/risk_sensitive_safety_modules.py:28-182).

These map a quantile-distributional Q representation (B, A, N) to scalar
action scores. Exactly like the reference (pearl_agent.py:97), the agent
injects its safety module into the policy learner at construction
(`PearlAgent.__post_init__`), so a risk-sensitive module passed to
`PearlAgent(safety_module=...)` reaches QR-DQN's acting and learning; the
learner's own `safety=` field remains for standalone (agent-less) use.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pearl_tpu.safety_modules.identity import SafetyModule


@dataclasses.dataclass(frozen=True, eq=False)
class RiskSensitiveSafetyModule(SafetyModule):
    def q_values_under_risk_metric(self, quantiles: jnp.ndarray) -> jnp.ndarray:
        """(B, A, N) quantile values -> (B, A) scores."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True, eq=False)
class RiskNeutralSafetyModule(RiskSensitiveSafetyModule):
    """Mean over quantiles — the default for distributional learners
    (reference :28-63)."""

    def q_values_under_risk_metric(self, quantiles: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(quantiles, axis=-1)


@dataclasses.dataclass(frozen=True, eq=False)
class QuantileNetworkMeanVarianceSafetyModule(RiskSensitiveSafetyModule):
    """mu - beta * Var of the quantile distribution (reference :99-182):
    risk-averse action scoring."""

    variance_weighting_coefficient: float = 0.1

    def q_values_under_risk_metric(self, quantiles: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(quantiles, axis=-1)
        var = jnp.var(quantiles, axis=-1)
        return mean - self.variance_weighting_coefficient * var
