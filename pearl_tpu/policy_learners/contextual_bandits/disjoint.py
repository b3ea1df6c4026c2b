"""Disjoint bandit container (reference:
pearl/policy_learners/contextual_bandits/disjoint_bandit.py:77-287 and the
deprecated disjoint_linear_bandit.py).

One independent bandit learner per arm over STATE features. The reference
composes arbitrary `ContextualBanditBase` learners per arm, partitions each
batch by action index in Python, and feeds a "null batch" to empty arms
(:77-162); acting runs `ensemble_forward` over the arm models (:172-201).
Here arm states are ONE stacked pytree (leading axis = num_arms) and every
arm updates every step with per-arm weights w * 1{action_index == arm} — a
zero-weight update leaves a closed-form arm's sufficient statistics untouched
(and gives a neural arm the same zero-gradient step the reference's null
batch does), so no partitioning, no ragged shapes, and the whole container
updates as one vmapped op.

`arm_learner` selects the per-arm model via the arm protocol
(arm_init/arm_mu_sigma/arm_update, implemented by LinearBandit and
NeuralBandit); the default is LinearBandit arms — the reference ground-truth
tests' configuration. 3-D per-arm states `(B, num_arms, f)` are supported
like the reference (:92-100): arm i sees state[:, i, :].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase
from pearl_tpu.policy_learners.contextual_bandits.linear_bandit import LinearBandit


@struct.dataclass
class DisjointBanditState:
    models: Any  # stacked per-arm states, every leaf's leading axis = num_arms
    explore_state: Any
    summarizer_params: Any = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DisjointBanditContainer(ContextualBanditBase):
    # Per-arm learner(s) providing the arm protocol. ONE learner means
    # homogeneous arms (the reference's tests and benchmarks always use one
    # type), which vectorize into a single vmapped update/forward — the
    # TPU-native ensemble_forward. A SEQUENCE of per-arm learners (reference
    # disjoint_bandit.py:77-90 accepts an arbitrary list, mixable per arm)
    # is grouped by configuration: each homogeneous run-of-the-list group
    # becomes one vmapped stack, so a [lin, lin, neural] container compiles
    # two vmapped programs, not three sequential arms.
    arm_learner: Any = dataclasses.field(default_factory=LinearBandit)
    l2_reg_lambda: float = 1.0  # convenience for default LinearBandit arms
    state_features_only: bool = True  # disjoint arms score the raw context

    def __post_init__(self):
        if isinstance(self.arm_learner, (list, tuple)):
            object.__setattr__(self, "arm_learner", tuple(self.arm_learner))
            return
        if (
            isinstance(self.arm_learner, LinearBandit)
            and self.l2_reg_lambda != 1.0
            and self.arm_learner.l2_reg_lambda == 1.0
        ):
            object.__setattr__(
                self,
                "arm_learner",
                dataclasses.replace(self.arm_learner, l2_reg_lambda=self.l2_reg_lambda),
            )

    # ------------------------------------------------- heterogeneous grouping
    @property
    def _heterogeneous(self) -> bool:
        return isinstance(self.arm_learner, tuple)

    def _groups(self):
        """Partition the per-arm learner list into maximal runs of identical
        configuration: [(learner, [arm indices]), ...]. Identical configs
        share one traced/vmapped program; arm order is preserved via the
        index lists."""
        groups = []
        for i, learner in enumerate(self.arm_learner):
            key = (type(learner), repr(learner))
            for g_key, g_learner, idxs in groups:
                if g_key == key:
                    idxs.append(i)
                    break
            else:
                groups.append((key, learner, [i]))
        return [(learner, idxs) for _, learner, idxs in groups]

    def init(self, key, observation_dim, action_space, num_envs):
        f = self.feature_dim(observation_dim)
        num_arms = action_space.n
        keys = jax.random.split(key, num_arms)
        if self._heterogeneous:
            if len(self.arm_learner) != num_arms:
                raise ValueError(
                    f"{len(self.arm_learner)} arm learners for a "
                    f"{num_arms}-arm action space"
                )
            models = tuple(
                jax.vmap(lambda k, lrn=learner: lrn.arm_init(k, f))(
                    keys[jnp.asarray(idxs)]
                )
                for learner, idxs in self._groups()
            )
        else:
            models = jax.vmap(lambda k: self.arm_learner.arm_init(k, f))(keys)
        return DisjointBanditState(
            models=models, explore_state=self.exploration.init(num_envs)
        )

    def mu_sigma(self, state: DisjointBanditState, features):
        # features: (B, A, f) — per-arm contexts (identical state features for
        # plain disjoint; 3-D per-arm states arrive here naturally).
        if self._heterogeneous:
            groups = self._groups()
            cols_mu, cols_sigma, perm = [], [], []
            for g, (learner, idxs) in enumerate(groups):
                mu_g, sigma_g = jax.vmap(
                    learner.arm_mu_sigma, in_axes=(0, 1), out_axes=1
                )(state.models[g], features[:, jnp.asarray(idxs), :])
                cols_mu.append(mu_g)
                cols_sigma.append(sigma_g)
                perm.extend(idxs)
            inv = [0] * len(perm)
            for pos, arm in enumerate(perm):
                inv[arm] = pos
            inv = jnp.asarray(inv)
            mu = jnp.concatenate(cols_mu, axis=1)[:, inv]
            sigma = jnp.concatenate(cols_sigma, axis=1)[:, inv]
            return mu, sigma
        mu, sigma = jax.vmap(
            self.arm_learner.arm_mu_sigma, in_axes=(0, 1), out_axes=1
        )(state.models, features)
        return mu, sigma

    @property
    def on_policy(self) -> bool:
        # Matches the most restrictive arm type (closed-form stats fold each
        # observation in once); neural arms tolerate it.
        return True

    def _per_arm_feats(self, batch):
        """(B, f) shared features or (B, A, f) per-arm features."""
        if batch.state.ndim == 3:
            return batch.state  # per-arm states (reference :92-100)
        return self.batch_features(batch)

    def learn_batch(self, state: DisjointBanditState, batch):
        feats = self._per_arm_feats(batch)
        weight = batch.weight if batch.weight is not None else jnp.ones_like(batch.reward)
        feats_axis = 1 if feats.ndim == 3 else None

        if self._heterogeneous:
            models = []
            for g, (learner, idxs) in enumerate(self._groups()):
                idx_arr = jnp.asarray(idxs)

                def per_arm(arm_state, arm_feats, arm_idx, lrn=learner):
                    w = weight * (batch.action_index == arm_idx).astype(jnp.float32)
                    return lrn.arm_update(arm_state, arm_feats, batch.reward, w)

                g_feats = feats[:, idx_arr, :] if feats.ndim == 3 else feats
                models.append(
                    jax.vmap(per_arm, in_axes=(0, feats_axis, 0))(
                        state.models[g], g_feats, idx_arr
                    )
                )
            return state.replace(models=tuple(models)), {}

        num_arms = jax.tree.leaves(state.models)[0].shape[0]

        def per_arm(arm_state, arm_feats, arm_idx):
            w = weight * (batch.action_index == arm_idx).astype(jnp.float32)
            return self.arm_learner.arm_update(arm_state, arm_feats, batch.reward, w)

        models = jax.vmap(per_arm, in_axes=(0, feats_axis, 0))(
            state.models, feats, jnp.arange(num_arms)
        )
        return state.replace(models=models), {}

    def learn(self, state, buffer, buffer_state, key):
        batch = buffer_state.storage
        n = batch.reward.shape[0]
        valid = (jnp.arange(n) < buffer_state.size).astype(jnp.float32)
        weight = batch.weight if batch.weight is not None else jnp.ones((n,))
        batch = batch.replace(weight=weight * valid)
        state, metrics = self.learn_batch(state, batch)
        return state, buffer_state, metrics


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class DisjointLinearBandit(DisjointBanditContainer):
    """Deprecated alias kept for API parity (reference
    disjoint_linear_bandit.py:35-144 — one LinearRegression per action)."""
