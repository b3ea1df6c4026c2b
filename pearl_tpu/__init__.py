"""pearl_tpu — a TPU-native RL agent framework with the capabilities of Meta's Pearl.

Design (see SURVEY.md for the reference analysis this is built against):

- Every Pearl "module" (policy learner, exploration module, safety module,
  history summarizer, action representation, replay buffer, environment) is a
  *static config object* with pure functions ``init(key, ...) -> State`` and
  ``apply/step(state, inputs, key) -> (state', outputs)``. States are
  ``flax.struct`` pytrees; configs are frozen dataclasses that are safe to
  close over under ``jax.jit``.
- The agent loop (act / observe / learn, reference ``pearl/pearl_agent.py``)
  is batched over N on-device environment instances via ``vmap`` and compiled
  as a single ``lax.scan`` program — no host round-trips in the hot loop.
- Replay buffers are HBM-resident ring buffers (preallocated arrays + cursor),
  replacing the reference's CPU deque + per-batch ``torch.cat``
  (``pearl/replay_buffers/tensor_based_replay_buffer.py``).
- Multi-chip scale-out uses ``jax.sharding.Mesh`` with a ``data`` axis:
  per-device env shards and replay shards, gradient ``psum`` for the learner,
  additive ``psum`` of LinUCB sufficient statistics (see pearl_tpu/parallel/).
"""

__version__ = "0.1.0"

from pearl_tpu.api.types import ActionResult  # noqa: F401
from pearl_tpu.api.spaces import (  # noqa: F401
    BoxActionSpace,
    BoxSpace,
    DiscreteActionSpace,
    DiscreteSpace,
)
