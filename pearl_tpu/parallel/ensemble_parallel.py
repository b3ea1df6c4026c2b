"""Ensemble-axis model parallelism for BootstrappedDQN.

The reference has no model parallelism of any kind (SURVEY.md §2.11); the one
model in this workload family with a shardable weight axis is the
K-member ensemble (EnsembleQValueNetwork: every param leaf carries a leading
K axis, and the per-member double-DQN losses are independent until the final
scalar sum — bootstrapped_dqn.py learn_batch).

This module shards that K axis over a `model` mesh axis purely with
sharding annotations on a 2-D (data, model) mesh: member params, target
params, frozen priors, and the mirrored optimizer moments land
member-partitioned; the batch is sharded over `data`; XLA/GSPMD inserts the
(tiny) cross-member reductions — the scalar loss and metric means — on its
own. No learner code changes ("pick a mesh, annotate shardings, let XLA
insert collectives").

At K=10 tiny MLPs this is demonstration-scale by design (docs/ROADMAP.md);
the same annotation pattern applies unchanged to large ensembles.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pearl_tpu.agent.pearl_agent import PearlAgent


def make_2d_mesh(
    data: int, model: int, *, axis_names: Tuple[str, str] = ("data", "model")
) -> Mesh:
    devices = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, axis_names)


def _member_sharding(state, ensemble_size: int, mesh: Mesh, model_axis: str):
    """Shard every learner-state leaf whose leading dim is the ensemble size
    over `model_axis`; replicate everything else."""
    member = NamedSharding(mesh, P(model_axis))
    replicated = NamedSharding(mesh, P())

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == ensemble_size:
            return member
        return replicated

    return jax.tree.map(spec, state)


def make_ensemble_sharded_learn_batch(
    agent: PearlAgent,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Returns a jitted `(learner_state, batch) -> (learner_state, metrics)`
    with the BootstrappedDQN ensemble axis sharded over `model_axis` and the
    transition batch sharded over `data_axis`.

    `agent` must hold a BootstrappedDQN (or any learner whose q_network has
    `ensemble_size` and whose state leaves carry the K-leading axis).
    """
    learner = agent.policy_learner
    K = learner.q_network.ensemble_size
    if K % mesh.shape[model_axis] != 0:
        raise ValueError(
            f"ensemble_size={K} must divide over the '{model_axis}' axis "
            f"({mesh.shape[model_axis]} devices)"
        )
    batch_sharding = NamedSharding(mesh, P(data_axis))

    def learn_batch(state, batch):
        return learner.learn_batch(state, batch)

    def compile_for(state, batch):
        state_sh = _member_sharding(state, K, mesh, model_axis)
        batch_sh = jax.tree.map(lambda _: batch_sharding, batch)
        return jax.jit(
            learn_batch,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, None),
        )

    # Shardings depend on the state pytree structure, so resolve lazily on
    # first call and cache.
    cache = {}

    def fn(state, batch):
        key = (jax.tree.structure(state), jax.tree.structure(batch))
        if key not in cache:
            cache[key] = compile_for(state, batch)
        return cache[key](state, batch)

    return fn
