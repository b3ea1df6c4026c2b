"""FrozenLake tutorial: DQN with one-hot observations on the 4x4 lake.

Port of the reference's frozen-lake tutorial (tutorials/frozen_lake,
unit-test twin test/unit/test_tutorials/test_frozen_lake.py): discrete cell
observations are one-hot encoded (built into the env; the
OneHotObservationsFromDiscrete wrapper does the same for any discrete-obs
env) and a plain DQN learns to reach the goal (return 1.0; the reference integration
anchor is five consecutive 1.0 episodes, test_integration.py:176-210).

Run:  python examples/frozen_lake_dqn.py
"""

import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import FrozenLake
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def main():
    env = FrozenLake(one_hot_obs=True, slippery=False)
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=64,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=10_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=10_000),
    )
    res = online_learning(
        agent, env, num_envs=32, max_steps=60_000,
        learn_every_k_steps=4, learning_starts=1_000, seed=0,
    )
    r = np.asarray(res.episode_returns)
    n = max(len(r) // 10, 20)
    print(
        f"{len(r)} episodes; success rate first {r[:n].mean():.2f} -> "
        f"last {r[-n:].mean():.2f} (reference anchor: 1.0)"
    )


if __name__ == "__main__":
    main()
