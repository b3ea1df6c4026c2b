"""Quick start: DQN on CartPole (reference tutorial: single_item_recommender
system & CartPole notebooks, tutorials/).

Run: python examples/dqn_cartpole.py  (add JAX_PLATFORMS=cpu off-TPU)
"""

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def main():
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=50_000),
    )
    result = online_learning(
        agent,
        CartPole(),
        num_envs=32,
        max_steps=150_000,
        learn_every_k_steps=4,
        learning_starts=2_000,
        seed=0,
        target_return=475.0,
        verbose=True,
    )
    print(
        f"reached={result.reached_target} steps={result.total_steps} "
        f"last-20 mean return={result.episode_returns[-20:].mean():.1f}"
    )


if __name__ == "__main__":
    main()
