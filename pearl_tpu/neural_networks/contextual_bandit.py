"""Contextual-bandit models (reference:
pearl/neural_networks/contextual_bandit/linear_regression.py and
neural_linear_regression.py).

`LinearRegression` keeps the sufficient statistics A = sum w x xT (+ ridge),
b = sum w x y of a weighted least-squares problem as a pytree, exactly like
the reference's buffers (linear_regression.py:193-220). The reference's
data-dependent inverse-vs-pinv fallback (:138-169) is replaced by an
always-Cholesky solve with ridge jitter — branch-free and TPU-friendly
(SURVEY.md §7 hard parts). The statistics are additive, so the reference's
vestigial torch.distributed all_reduce (:208-211) becomes an optional `psum`
over a mesh axis.

Feature convention: `append_ones` prepends a 1 column (intercept,
linear_regression.py:124-136), so A is (d+1, d+1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.neural_networks.common import MLP


@struct.dataclass
class LinearRegressionState:
    A: jnp.ndarray  # (d+1, d+1)
    b: jnp.ndarray  # (d+1,)
    sum_weight: jnp.ndarray  # scalar
    weight_since_discount: jnp.ndarray  # for periodic discounting


def append_ones(x: jnp.ndarray) -> jnp.ndarray:
    """Prepend the intercept column (reference append_ones)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([ones, x], axis=-1)


@dataclasses.dataclass(frozen=True)
class LinearRegression:
    feature_dim: int  # WITHOUT the intercept column
    l2_reg_lambda: float = 1.0
    gamma: float = 1.0  # discounting multiplier (<1 enables discounting)
    apply_discounting_interval: float = 0.0  # in accumulated weight units
    pmean_axis: Optional[str] = None

    @property
    def dim(self) -> int:
        return self.feature_dim + 1

    def init(self) -> LinearRegressionState:
        return LinearRegressionState(
            A=self.l2_reg_lambda * jnp.eye(self.dim),
            b=jnp.zeros((self.dim,)),
            sum_weight=jnp.zeros(()),
            weight_since_discount=jnp.zeros(()),
        )

    def update(
        self,
        state: LinearRegressionState,
        x: jnp.ndarray,
        y: jnp.ndarray,
        weight: Optional[jnp.ndarray] = None,
    ) -> LinearRegressionState:
        """Weighted least-squares update: A += xT w x (symmetrized), b += xT w y
        (linear_regression.py:193-220)."""
        x = append_ones(x)
        if weight is None:
            weight = jnp.ones_like(y)
        delta_A = jnp.einsum("b,bi,bj->ij", weight, x, x)
        delta_b = jnp.einsum("b,bi,b->i", weight, x, y)
        delta_w = jnp.sum(weight)
        if self.pmean_axis is not None:
            # Additive stats: psum replaces the reference's all_reduce.
            delta_A, delta_b, delta_w = jax.lax.psum(
                (delta_A, delta_b, delta_w), self.pmean_axis
            )
        delta_A = (delta_A + delta_A.T) / 2.0
        new = LinearRegressionState(
            A=state.A + delta_A,
            b=state.b + delta_b,
            sum_weight=state.sum_weight + delta_w,
            weight_since_discount=state.weight_since_discount + delta_w,
        )
        if self.gamma < 1.0 and self.apply_discounting_interval > 0:
            new = self._maybe_discount(new)
        return new

    def _maybe_discount(self, state: LinearRegressionState) -> LinearRegressionState:
        """Discount A, b by gamma whenever the accumulated weight since the
        last discount crosses the interval (linear_regression.py:222-239)."""
        do = state.weight_since_discount >= self.apply_discounting_interval
        scale = jnp.where(do, self.gamma, 1.0)
        ridge = self.l2_reg_lambda * jnp.eye(self.dim)
        # Discount only the data part of A, keeping the ridge prior intact —
        # the reference stores _A ridge-free (zeros init, linear_regression.py
        # :71-73) and adds the ridge in the `A` property (:91-96), so its
        # apply_discounting (:222-239) never touches the prior either.
        # sum_weight is NOT discounted (reference: "don't discount sum_weight
        # because it's used to determine when to apply discounting").
        return LinearRegressionState(
            A=(state.A - ridge) * scale + ridge,
            b=state.b * scale,
            sum_weight=state.sum_weight,
            weight_since_discount=jnp.where(do, 0.0, state.weight_since_discount),
        )

    def coefs(self, state: LinearRegressionState) -> jnp.ndarray:
        """Solve A beta = b via Cholesky with jitter (branch-free pinv
        replacement)."""
        A = state.A + 1e-6 * jnp.eye(self.dim)
        factor = jax.scipy.linalg.cho_factor(A)
        return jax.scipy.linalg.cho_solve(factor, state.b)

    def predict(self, state: LinearRegressionState, x: jnp.ndarray) -> jnp.ndarray:
        """mu(x) = xT beta; x (..., feature_dim)."""
        return append_ones(x) @ self.coefs(state)

    def calculate_sigma(
        self, state: LinearRegressionState, x: jnp.ndarray
    ) -> jnp.ndarray:
        """sigma(x) = sqrt(xT A^-1 x) (linear_regression.py:262-271)."""
        xe = append_ones(x)
        A = state.A + 1e-6 * jnp.eye(self.dim)
        factor = jax.scipy.linalg.cho_factor(A)
        solved = jax.scipy.linalg.cho_solve(factor, xe.reshape(-1, self.dim).T)
        quad = jnp.sum(xe.reshape(-1, self.dim).T * solved, axis=0)
        sigma = jnp.sqrt(jnp.maximum(quad, 0.0))
        return sigma.reshape(x.shape[:-1])

    def sample_coefs(
        self, state: LinearRegressionState, key: jnp.ndarray
    ) -> jnp.ndarray:
        """Thompson sampling: beta ~ N(coefs, A^-1) via Cholesky of A^-1
        (thompson_sampling_exploration.py:25-143)."""
        A = state.A + 1e-6 * jnp.eye(self.dim)
        mean = self.coefs(state)
        # A^-1 = L^-T L^-1 for A = L L^T; sample = mean + L^-T eps.
        L = jnp.linalg.cholesky(A)
        eps = jax.random.normal(key, (self.dim,))
        delta = jax.scipy.linalg.solve_triangular(L.T, eps, lower=False)
        return mean + delta


@dataclasses.dataclass(frozen=True)
class NeuralLinearRegression:
    """MLP feature extractor -> LinearRegression head (reference
    neural_linear_regression.py:24-158, Neural LinUCB/LinTS per
    arXiv 2012.01780). In `nn_e2e` mode mu comes from an end-to-end linear
    output head while sigma still comes from the LinUCB statistics over the
    learned features (:45-127)."""

    feature_dim: int  # raw input dim
    hidden_dims: tuple = (64, 64)
    linear_feature_dim: int = 16  # learned-feature dim fed to LinearRegression
    nn_e2e: bool = True
    # Output activation applied to mu (reference neural_linear_regression.py
    # `output_activation_name`, e.g. "sigmoid" for click-probability heads).
    # forward_with_intermediate_values returns PRE-activation mu — the
    # learner decides placement around the UCB bonus (see NeuralLinearBandit
    # `separate_uncertainty`); apply_output_activation exposes the map.
    output_activation: str = "linear"

    def mlp(self) -> MLP:
        return MLP(
            hidden_dims=tuple(self.hidden_dims),
            output_dim=self.linear_feature_dim,
            last_activation="relu",
        )

    def head(self) -> MLP:
        return MLP(hidden_dims=(), output_dim=1)

    def linear_regression(self, pmean_axis=None) -> LinearRegression:
        return LinearRegression(
            feature_dim=self.linear_feature_dim, pmean_axis=pmean_axis
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        x0 = jnp.zeros((1, self.feature_dim))
        mlp_params = self.mlp().init(k1, x0)["params"]
        f0 = jnp.zeros((1, self.linear_feature_dim))
        head_params = self.head().init(k2, f0)["params"]
        return {
            "mlp": mlp_params,
            "head": head_params,
            "linreg": self.linear_regression().init(),
        }

    def features(self, params, x):
        return self.mlp().apply({"params": params["mlp"]}, x)

    def apply_output_activation(self, x):
        from pearl_tpu.neural_networks.common import resolve_activation

        return resolve_activation(self.output_activation)(x)

    def forward_with_intermediate_values(self, params, x):
        """Returns (mu_pre_activation, sigma, learned_features) — the
        reference's pred_label_pre_activation / sigma / nn_output triple."""
        feats = self.features(params, x)
        linreg = self.linear_regression()
        if self.nn_e2e:
            mu = self.head().apply({"params": params["head"]}, feats)[..., 0]
        else:
            mu = linreg.predict(params["linreg"], feats)
        sigma = linreg.calculate_sigma(params["linreg"], feats)
        return mu, sigma, feats
