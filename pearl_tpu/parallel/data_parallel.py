"""Data-parallel actor-learner over a device mesh.

Layout ("stacked state" pattern): every state leaf gains a leading device
axis of size n_devices and is sharded over the `data` mesh axis with
`shard_map`, so each device holds

- its own env shard (num_envs_per_device instances) and replay shard,
- a replica of the learner state, kept bit-identical across devices by
  initializing from a shared key and `pmean`-ing gradients inside
  `learn_batch` (learner configs expose `pmean_axis`).

One `step()` = steps_per_learn vectorized env steps + one synchronized learn,
compiled as a single program per device with the gradient all-reduce riding
ICI — the TPU-native replacement for the reference's (nonexistent)
distributed story, and the shape multi-host scaling takes (hosts extend the
same mesh axis over DCN via jax.distributed).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pearl_tpu.agent.pearl_agent import PearlAgent
from pearl_tpu.envs.vector import VectorEnv


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def reshard_agent_state(stacked_state, n_devices: int):
    """Re-stack a mesh-stacked AgentState (leading device axis) for a mesh of
    a different width — the checkpoint-restore path when a DP run resumes on
    fewer/more chips.

    Learner/safety replicas are identical across the old axis, so any slice is
    exact. Replay shards are device-local data: shrinking keeps the first
    `n_devices` shards (the dropped shards' transitions are lost — replay is
    re-fillable experience, not model state); growing reuses shards cyclically
    (duplicate experience is benign under with-replacement sampling). Per-env
    leaves (history carries, masks) are rebuilt by `online_learning` when the
    restored state is passed with fresh envs.
    """
    old = jax.tree.leaves(stacked_state)[0].shape[0]
    idx = np.arange(n_devices) % old
    # Materialize as uncommitted (host-sourced) arrays: the slices must not
    # stay sharded over the OLD device set, or the new mesh's jit rejects
    # them as incompatibly placed.
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx]), stacked_state)


@dataclasses.dataclass(eq=False)
class DataParallelRunner:
    agent: PearlAgent
    env: object
    mesh: Mesh
    num_envs_per_device: int = 128
    steps_per_learn: int = 8
    axis: str = "data"

    def __post_init__(self):
        learner = dataclasses.replace(
            self.agent.policy_learner, pmean_axis=self.axis
        )
        self.agent = dataclasses.replace(self.agent, policy_learner=learner).for_env(
            self.env
        )
        self.venv = VectorEnv(self.env, self.num_envs_per_device)
        self.n_devices = self.mesh.devices.size
        self._init_jit = jax.jit(
            jax.shard_map(
                self._init_shard,
                mesh=self.mesh,
                in_specs=(P(self.axis), P()),
                out_specs=P(self.axis),
            )
        )
        self._step_jit = jax.jit(
            jax.shard_map(
                self._step_shard,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis)),
                out_specs=(P(self.axis), P(self.axis), P(self.axis)),
            )
        )

    # Per-device programs: leaves carry a leading axis of size 1 (this
    # device's slice of the stacked global state).
    def _init_shard(self, dev_keys, shared_key):
        # Env shards use this device's key; the learner replica uses the
        # SHARED key so params start bit-identical on every device.
        env_states, obs = self.venv.reset(dev_keys[0])
        astate = self.agent.init(
            shared_key, self.venv.observation_dim, self.num_envs_per_device, obs
        )
        return jax.tree.map(lambda x: x[None], (astate, env_states))

    def _step_shard(self, astate, env_states, keys):
        astate, env_states = jax.tree.map(lambda x: x[0], (astate, env_states))
        key = keys[0]

        def env_step(carry, k):
            astate, env_states = carry
            k_act, k_env, k_obs = jax.random.split(k, 3)
            astate, choice = self.agent.act(astate, k_act)
            env_states, result, next_obs = self.venv.step(
                env_states, choice.action, k_env
            )
            astate = self.agent.observe(astate, result, next_obs, k_obs)
            return (astate, env_states), jnp.sum(result.reward)

        ks = jax.random.split(key, self.steps_per_learn + 1)
        (astate, env_states), rew = jax.lax.scan(
            env_step, (astate, env_states), ks[:-1]
        )
        astate, _ = self.agent.learn(astate, ks[-1])
        reward_sum = jax.lax.psum(jnp.sum(rew), self.axis)
        return jax.tree.map(
            lambda x: x[None], (astate, env_states, reward_sum / self.n_devices)
        )

    # ------------------------------------------------------------------ API
    def init(self, key):
        k_shared, key = jax.random.split(key)
        keys = jax.random.split(key, self.n_devices)
        return self._init_jit(keys, k_shared)

    def step(self, astate, env_states, key):
        """One DP step: per-device env rollouts + one psum-synchronized learn.
        Returns (astate, env_states, reward_sum_per_device_mean)."""
        keys = jax.random.split(key, self.n_devices)
        return self._step_jit(astate, env_states, keys)

    @property
    def env_steps_per_call(self) -> int:
        return self.steps_per_learn * self.num_envs_per_device * self.n_devices
