"""Vectorized environments with auto-reset.

The reference steps ONE env per Python iteration
(pearl/utils/functional_utils/train_and_eval/online_learning.py:278-310).
Here N env instances step in lockstep under `vmap`; episodes reset
asynchronously via `tree_select` on the done flag. `step` returns both the
`ActionResult` batch (whose `observation` is the *terminal* observation, which
is what replay must store as next_state) and the post-reset observation batch
(what the agent must act on next).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.types import ActionResult, PRNGKey
from pearl_tpu.utils.pytree import tree_select


class VectorEnv:
    def __init__(self, env: Environment, num_envs: int):
        self.env = env
        self.num_envs = num_envs

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def observation_dim(self):
        return self.env.observation_dim

    def reset(self, key: PRNGKey):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(
        self, states, actions: jnp.ndarray, key: PRNGKey
    ) -> Tuple[object, ActionResult, jnp.ndarray]:
        """Returns (new_states, results, next_obs) with auto-reset applied to
        new_states/next_obs but NOT to results.observation."""
        k_step, k_reset = jax.random.split(key)
        step_keys = jax.random.split(k_step, self.num_envs)
        new_states, results = jax.vmap(self.env.step)(states, actions, step_keys)
        reset_keys = jax.random.split(k_reset, self.num_envs)
        fresh_states, fresh_obs = jax.vmap(self.env.reset)(reset_keys)
        done = results.done
        next_states = tree_select(done, fresh_states, new_states)
        next_obs = tree_select(done, fresh_obs, results.observation)
        return next_states, results, next_obs
