"""Test configuration.

This container's interpreter boots with a sitecustomize (PYTHONPATH entry
`/root/.axon_site`) that registers the axon TPU PJRT plugin and sets
`jax_platforms="axon,cpu"` at the *config* level — so the JAX_PLATFORMS env
var alone cannot force CPU, and every test op/compile would silently go over
the TPU network tunnel (100-200x slower). Tests must run on the local CPU
backend with virtual devices so multi-chip sharding logic is exercised
without TPU hardware (SURVEY.md §4); we therefore override the config here,
before any backend is initialized.

The virtual device count matches the container's core count: oversubscribing
XLA:CPU devices vs physical cores inflates compile times ~100x.
"""

import os
import sys

_count = min(os.cpu_count() or 2, 2)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_count}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo importable regardless of how pytest was invoked.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)
