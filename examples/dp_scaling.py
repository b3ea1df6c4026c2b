"""Weak-scaling measurement of DataParallelRunner over a device mesh.

Runs the stacked-state data-parallel actor-learner (env + replay shards per
device, learner replicated with in-graph gradient pmean) at 1/2/4/8 devices
with a FIXED per-device workload (256 envs, batch 256) and reports aggregate
env-steps/s plus a replica-sync check (learner params must stay bit-identical
across devices — the pmean keeps them in lockstep from a shared init key).

On real multi-chip TPU slices the mesh axes ride ICI; on a CPU host this
script uses XLA virtual host devices (set before importing jax):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/dp_scaling.py

Note the virtual-device caveat: all virtual devices share the host's physical
cores, so wall-clock scaling saturates at the core count; the quantity this
validates on CPU is the monotonic aggregate trend + synchronization, not the
ICI scaling efficiency (BASELINE.md's >=80% target needs a real slice).
"""

import time

import jax
import jax.numpy as jnp

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.parallel import DataParallelRunner, make_mesh
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer


def measure(n_devices: int, calls: int = 40, envs_per_device: int = 256):
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=256),
        replay_buffer=BasicReplayBuffer(capacity=8192),
    )
    runner = DataParallelRunner(
        agent,
        CartPole(),
        make_mesh(n_devices),
        num_envs_per_device=envs_per_device,
        steps_per_learn=8,
    )
    astate, env_states = runner.init(jax.random.PRNGKey(0))
    astate, env_states, r = runner.step(astate, env_states, jax.random.PRNGKey(1))
    jax.block_until_ready(r)  # compile + first exec outside the timed region
    t0 = time.perf_counter()
    for i in range(calls):
        astate, env_states, r = runner.step(
            astate, env_states, jax.random.PRNGKey(2 + i)
        )
    jax.block_until_ready(r)
    sps = calls * runner.env_steps_per_call / (time.perf_counter() - t0)
    p = jax.tree.leaves(astate.learner.params)[0]
    in_sync = all(bool(jnp.array_equal(p[0], p[i])) for i in range(n_devices))
    return sps, in_sync


if __name__ == "__main__":
    widths = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    for n in widths:
        sps, in_sync = measure(n)
        print(
            f"devices={n} total_envs={256 * n} steps/s={sps:,.0f} "
            f"per_device={sps / n:,.0f} replicas_in_sync={in_sync}"
        )
