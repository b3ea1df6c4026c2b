"""Quantile-regression DQN (reference:
pearl/policy_learners/sequential_decision_making/quantile_regression_deep_td_learning.py
and quantile_regression_deep_q_learning.py).

Semantics preserved:
- Acting scores actions with the risk metric applied to the quantile
  distribution (`safety.get_q_values_under_risk_metric`,
  quantile_regression_deep_td_learning.py:143-174).
- QR loss (:185-279): pairwise u_ij = T theta_j(s', a*) - theta_i(s, a),
  elementwise Huber (kappa=1), asymmetric weight |tau_hat_i - 1{u<0}|,
  summed over the predicted-quantile axis, averaged over target quantiles
  and batch.
- Greedy next action chosen under the risk metric on the TARGET network
  (quantile_regression_deep_q_learning.py:93-150).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.q_value_networks import QuantileQValueNetwork
from pearl_tpu.policy_learners.exploration_modules.common import masked_argmax
from pearl_tpu.policy_learners.sequential_decision_making.deep_td import (
    DeepTDLearning,
)
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.safety_modules.risk_sensitive import (
    RiskNeutralSafetyModule,
    RiskSensitiveSafetyModule,
)


def _huber(u: jnp.ndarray, kappa: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber (reference loss_fn_utils.py:75-81)."""
    absu = jnp.abs(u)
    return jnp.where(absu <= kappa, 0.5 * u**2, kappa * (absu - 0.5 * kappa))


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class QuantileRegressionDeepQLearning(DeepTDLearning):
    q_network: Any = QuantileQValueNetwork(num_quantiles=10)
    safety: RiskSensitiveSafetyModule = RiskNeutralSafetyModule()

    @property
    def is_distributional(self) -> bool:
        return True

    def _scores(self, state, subjective_state, candidates, mask):
        params, subjective_state, candidates = self._act_cast(
            state.params, subjective_state, candidates
        )
        quantiles = self.q_network.quantiles_all(
            params, subjective_state, candidates, mask
        ).astype(jnp.float32)
        return self.safety.q_values_under_risk_metric(quantiles)

    def learn_batch(self, state, batch: TransitionBatch):
        gamma = self.discount_factor
        tau_hat = self.q_network.midpoints()  # (N,)
        N = tau_hat.shape[0]

        def loss_fn(trainable):
            subj = self.history_summarizer.forward(trainable["summ"], batch.state)
            next_subj = jax.lax.stop_gradient(
                self.history_summarizer.forward(trainable["summ"], batch.next_state)
            )
            B = subj.shape[0]
            candidates = self.represented_candidates(B)
            # theta_i(s, a): quantiles of the taken action under the online net.
            q_quant = self.q_network.quantiles_all(
                trainable["q"], subj, candidates, batch.curr_available_mask
            )  # (B, A, N)
            theta = jnp.take_along_axis(
                q_quant, batch.action_index[:, None, None], axis=1
            )[:, 0, :]  # (B, N)

            # Greedy next action under the risk metric on the target network.
            next_quant = self.q_network.quantiles_all(
                state.target_params, next_subj, candidates, batch.next_available_mask
            )  # (B, A, N)
            next_scores = self.safety.q_values_under_risk_metric(next_quant)
            a_star = masked_argmax(next_scores, batch.next_available_mask)
            theta_next = jnp.take_along_axis(
                next_quant, a_star[:, None, None], axis=1
            )[:, 0, :]  # (B, N)

            not_done = 1.0 - batch.terminated.astype(jnp.float32)
            target = jax.lax.stop_gradient(
                batch.reward[:, None] + gamma * not_done[:, None] * theta_next
            )  # (B, N) over j

            u = target[:, None, :] - theta[:, :, None]  # (B, i, j)
            huber = _huber(u)
            weight = jnp.abs(tau_hat[None, :, None] - (u < 0.0).astype(jnp.float32))
            # Sum over predicted quantiles i, mean over target quantiles j and
            # batch (reference :185-279 `sum(dim=1).mean()`).
            loss = jnp.mean(jnp.sum(jnp.mean(weight * huber, axis=2), axis=1))

            q_sa = jnp.mean(theta, axis=-1)
            per_sample = jnp.abs(jnp.mean(target, axis=-1) - q_sa)
            return loss, {"loss": jnp.mean(per_sample), "per_sample_td": per_sample}

        return self._apply_gradients(state, loss_fn)
