"""Worker process for the true multi-process data-parallel test.

Launched twice by test_multiprocess_dp.py with PROC_ID=0/1. Each process owns
ONE XLA:CPU device; jax.distributed + gloo collectives wire them into a
2-device global `data` mesh — the same topology as two single-chip TPU hosts
over DCN (SURVEY.md §2.11 TPU-native equivalent column).

Prints PARAMS_HASH/REWARD lines; the parent asserts the learner replicas
stayed bit-identical across processes after psum-synchronized learns.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# jax.distributed must be wired BEFORE anything touches the XLA backend —
# even importing pearl_tpu builds module-level jnp constants.
jax.distributed.initialize(
    coordinator_address=os.environ["COORD_ADDR"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)

from pearl_tpu.parallel.multihost import global_mesh  # noqa: E402
from pearl_tpu.agent import PearlAgent  # noqa: E402
from pearl_tpu.envs import CartPole  # noqa: E402
from pearl_tpu.parallel import DataParallelRunner  # noqa: E402
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning  # noqa: E402
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2  # global view: one CPU device per process

    mesh = global_mesh()
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=4096),
    )
    runner = DataParallelRunner(
        agent, CartPole(), mesh, num_envs_per_device=16, steps_per_learn=4
    )
    astate, env_states = runner.init(jax.random.PRNGKey(0))
    reward = None
    for i in range(3):
        astate, env_states, reward = runner.step(
            astate, env_states, jax.random.PRNGKey(1 + i)
        )

    # The learner replica on THIS process's device must match the other
    # process's bit-for-bit (same init key + pmean-synchronized grads).
    local_leaves = []
    for leaf in jax.tree.leaves(astate.learner):
        if hasattr(leaf, "addressable_shards"):
            local_leaves.append(np.asarray(leaf.addressable_shards[0].data))
        else:
            local_leaves.append(np.asarray(leaf))
    digest = float(sum(np.sum(np.abs(x.astype(np.float64))) for x in local_leaves))
    print(f"PARAMS_HASH {digest:.10e}", flush=True)
    # reward is sharded over the 2-process mesh: read this process's shard
    # (psum makes every shard carry the same global value).
    local_reward = np.asarray(reward.addressable_shards[0].data).reshape(-1)[0]
    print(f"REWARD {float(local_reward):.6f}", flush=True)


if __name__ == "__main__":
    main()
