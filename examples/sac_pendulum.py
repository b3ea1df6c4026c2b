"""Continuous control: Soft Actor-Critic on Pendulum.

Run: python examples/sac_pendulum.py
"""

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def main():
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(training_rounds=1, batch_size=256),
        replay_buffer=BasicReplayBuffer(capacity=100_000),
    )
    result = online_learning(
        agent,
        Pendulum(),
        num_envs=16,
        max_steps=300_000,
        learn_every_k_steps=1,
        learning_starts=1_000,
        seed=0,
        target_return=-250.0,
        verbose=True,
    )
    print(
        f"reached={result.reached_target} "
        f"last-20 mean return={result.episode_returns[-20:].mean():.1f}"
    )


if __name__ == "__main__":
    main()
