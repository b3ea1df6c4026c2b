"""Atari DQN through the host loop (reference: the Atari branch of
scripts/benchmark_config.py:1679-1747 + user_envs/wrappers/atari_wrappers.py).

Atari emulation is host-side by nature; the preprocessing stack
(NoopReset -> MaxAndSkip -> EpisodicLife -> FireReset) wraps a Gymnasium ALE
env, the `GymEnvironment` adapter bridges it to the functional API, and the
CNN Q-network trains through `training.host_loop`. Requires `ale_py` ROMs
(not bundled in every image; the stack itself is unit-tested against a
scripted fake in tests/test_atari_and_puckworld.py, and the on-device CNN
path is covered by the pure-JAX Breakout example/test).

Usage: python examples/atari_dqn.py [PongNoFrameskip-v4]
"""

import sys

import gymnasium
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs.atari import wrap_atari
from pearl_tpu.envs.gym_adapter import GymEnvironment
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import agent_online_learning_host


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "PongNoFrameskip-v4"
    # The reference's exact stack (benchmark_config.py:1733-1746):
    # Noop -> MaxAndSkip -> EpisodicLife -> Fire -> Resize -> Grayscale ->
    # FrameStack(4), then transposed channels-last for the CNN.
    env = wrap_atari(gymnasium.make(name))
    env = gymnasium.wrappers.ResizeObservation(env, (84, 84))
    env = gymnasium.wrappers.GrayscaleObservation(env)
    env = gymnasium.wrappers.FrameStackObservation(env, 4)
    env = gymnasium.wrappers.TransformObservation(
        env,
        lambda o: np.transpose(np.asarray(o), (1, 2, 0)),
        gymnasium.spaces.Box(0, 255, (84, 84, 4), np.uint8),
    )
    env = GymEnvironment(env)

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(84, 84, 4),
                out_channels=(32, 64, 64),
                kernel_sizes=(8, 4, 3),
                strides=(4, 2, 1),
                paddings=(0, 0, 0),
                hidden_dims=(512,),
            ),
            training_rounds=1,
            batch_size=32,
            exploration=EGreedyExploration(
                start_epsilon=1.0, end_epsilon=0.05, warmup_steps=100_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=100_000, bf16_storage=True),
    )
    returns = agent_online_learning_host(
        agent, env, max_steps=1_000_000, learn_every_k_steps=4,
        learning_starts=10_000, seed=0, verbose=True,
    )
    print(f"episodes={len(returns)} last20={np.mean(returns[-20:]):.1f}")


if __name__ == "__main__":
    main()
