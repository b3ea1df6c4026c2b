"""Weak-scaling measurement of the PRODUCTION driver over a device mesh.

Runs `online_learning(agent, env, mesh=...)` — the same user-facing driver
as single-chip, with summary-mode episode accounting and early stopping live
— at 1/2/4/8 devices with a FIXED per-device workload (256 envs, batch 256)
and reports aggregate env-steps/s plus a replica-sync check (learner params
must stay bit-identical across devices — the in-graph gradient pmean keeps
them in lockstep from a shared init key).

On real multi-chip TPU slices the mesh axis rides ICI; on a CPU host this
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
from pearl_tpu.parallel import make_mesh
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def measure(n_devices: int, calls: int = 40, envs_per_device: int = 256):
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=256),
        replay_buffer=BasicReplayBuffer(capacity=8192),
    )
    mesh = make_mesh(n_devices)
    num_envs = envs_per_device * n_devices
    steps_per_learn = 8
    common = dict(
        num_envs=num_envs, learn_every_k_steps=steps_per_learn,
        chunks_per_dispatch=4, stats="summary", mesh=mesh,
        target_return=1e9,  # early-stop accounting active, never triggers
    )
    # Warmup: compile + first exec outside the timed region.
    warm = online_learning(
        agent, CartPole(), max_steps=num_envs * steps_per_learn * 4,
        seed=0, **common,
    )
    t0 = time.perf_counter()
    res = online_learning(
        agent, CartPole(),
        max_steps=num_envs * steps_per_learn * 4 * calls,
        seed=1, agent_state=warm.agent_state, **common,
    )
    elapsed = time.perf_counter() - t0
    sps = res.total_steps / elapsed
    # Replica sync: every device's learner params bit-identical.
    spread = max(
        float(jnp.max(jnp.abs(x - x[0])))
        for x in jax.tree.leaves(res.agent_state.learner.params)
    )
    return sps, spread, res.total_episodes


def main():
    n_avail = len(jax.devices())
    widths = [n for n in (1, 2, 4, 8) if n <= n_avail]
    base = None
    print(f"devices available: {n_avail} ({jax.devices()[0].platform})")
    print(f"{'devices':>8} {'agg steps/s':>14} {'vs 1-dev':>9} {'sync':>6} {'episodes':>9}")
    for n in widths:
        sps, spread, eps = measure(n)
        base = base or sps
        sync = "OK" if spread == 0.0 else f"DIVERGED({spread:.1e})"
        print(f"{n:>8} {sps:>14,.0f} {sps / base:>8.2f}x {sync:>6} {eps:>9}")


if __name__ == "__main__":
    main()
