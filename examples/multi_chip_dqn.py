"""Data-parallel DQN over every available chip, through the PRODUCTION
driver (reference: none — the reference is single-device; see SURVEY.md
§2.11): `online_learning(mesh=...)` with device-side episode accounting and
early stopping live, learner replicated via in-graph gradient pmean.

Run: python examples/multi_chip_dqn.py
(on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu)
"""

import jax
import jax.numpy as jnp

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.parallel import make_mesh
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def main():
    mesh = make_mesh()
    n = int(mesh.devices.size)
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,  # learn ratio ~2 samples/env-step, the
            batch_size=512,     # known-good CartPole recipe scaled to 128 envs
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=65_536),
    )
    res = online_learning(
        agent,
        CartPole(),
        mesh=mesh,
        num_envs=64 * n,  # global env count, split across devices
        max_steps=400_000 * n,
        learn_every_k_steps=4,
        learning_starts=2_048 * n,
        stats="summary",
        target_return=450.0,
        seed=7,
        verbose=True,
    )
    spread = max(
        float(jnp.max(jnp.abs(x - x[0])))
        for x in jax.tree.leaves(res.agent_state.learner.params)
    )
    print(
        f"devices={n} reached_target={res.reached_target} "
        f"steps={res.total_steps} episodes={res.total_episodes} "
        f"replica_spread={spread}"
    )


if __name__ == "__main__":
    main()
