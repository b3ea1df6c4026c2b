"""Multi-host scale-out helpers.

One TPU host extends the same `data` mesh axis across hosts: ICI within a
slice, DCN across slices — no code changes in the learners, since
`DataParallelRunner`'s `pmean`/`psum` ride whatever the mesh provides
(the "How to Scale Your Model" recipe: pick a mesh, annotate shardings, let
XLA insert collectives).

The reference has no multi-host support at all (SURVEY.md §2.11); this module
is the first-class replacement: `initialize()` wires `jax.distributed`, and
`global_mesh()` builds a mesh over every addressable device in the job.
Single-host fallback is automatic, so code written against this module runs
unchanged from a laptop CPU to a pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host job. No-op when arguments
    are omitted and the environment provides no cluster configuration."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # Single-process run (no cluster env) — fine.
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(axis: str = "data") -> Mesh:
    """A 1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    return jax.process_index()
