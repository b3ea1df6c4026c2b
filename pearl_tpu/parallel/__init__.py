"""Distribution layer — the component the reference lacks (SURVEY.md §2.11).

The reference is single-process/single-device; its only distributed traces are
a vestigial all_reduce of LinUCB sufficient statistics
(pearl/neural_networks/contextual_bandit/linear_regression.py:208-211). Here
distribution is first-class:

- `data` mesh axis: env shards + replay shards per device, learner replicated,
  gradients (and LinUCB A/b statistics, which are additive) synchronized with
  `psum`/`pmean` over ICI.
- `model` mesh axis (ensemble_parallel): the K-member Q-ensemble of
  BootstrappedDQN sharded member-wise on a 2-D (data, model) mesh with pure
  sharding annotations — the one weight axis in this workload family that
  meaningfully shards.
- Strategy applicability for this workload (RL agents over small MLPs):
  DP is the scaling axis that matters; TP of the tiny actor/critic MLPs and
  PP/SP are intentionally out of scope (documented non-goals per
  SURVEY.md §2.11 — there is no model large enough to shard and no sequence
  longer than the 8-step history window).
"""

from pearl_tpu.parallel.data_parallel import (
    DataParallelRunner,
    make_mesh,
    reshard_agent_state,
)
from pearl_tpu.parallel.ensemble_parallel import (
    make_2d_mesh,
    make_ensemble_sharded_learn_batch,
)
from pearl_tpu.parallel import multihost

__all__ = [
    "DataParallelRunner",
    "make_mesh",
    "reshard_agent_state",
    "make_2d_mesh",
    "make_ensemble_sharded_learn_batch",
    "multihost",
]
