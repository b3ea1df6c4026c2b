"""Data-parallel DQN over every available chip (reference: none — the
reference is single-device; see SURVEY.md §2.11).

Run: python examples/multi_chip_dqn.py
(on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu)
"""

import jax

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.parallel import DataParallelRunner, make_mesh
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer


def main():
    mesh = make_mesh()
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=512),
        replay_buffer=BasicReplayBuffer(capacity=65_536),
    )
    runner = DataParallelRunner(
        agent, CartPole(), mesh, num_envs_per_device=512, steps_per_learn=8
    )
    key = jax.random.PRNGKey(0)
    astate, env_states = runner.init(key)
    for i in range(50):
        key, k = jax.random.split(key)
        astate, env_states, reward = runner.step(astate, env_states, k)
    print(
        f"devices={runner.n_devices} env_steps/call={runner.env_steps_per_call} "
        f"mean step reward={float(reward[0]):.3f}"
    )


if __name__ == "__main__":
    main()
