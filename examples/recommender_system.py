"""Single-item recommender system with a dynamic action space.

Port of the reference tutorial
(tutorials/single_item_recommender_system_example, unit-test twin
test/unit/test_tutorials/test_rec_system.py): each step the agent picks one
of two candidate items (100-dim embeddings in the reference, synthetic
embeddings here), a frozen user model emits a Bernoulli click, and the agent
only observes the click — item/action history carries the state, recovered by
the LSTM history-summarization module. Demonstrates:

- dynamic action spaces as per-step availability masks over a fixed catalog,
- embedding-valued actions with IdentityActionRepresentation,
- LSTM history summarization,
- BootstrappedDQN + deep exploration as the tutorial's second agent.

Run:  python examples/recommender_system.py
"""

import jax
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.action_representation_modules import IdentityActionRepresentation
from pearl_tpu.envs import RecommenderEnvironment
from pearl_tpu.history_summarization_modules import LSTMHistorySummarization
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import (
    BootstrappedDQN,
    DeepQLearning,
)
from pearl_tpu.replay_buffers.bootstrap import BootstrapReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def main():
    env = RecommenderEnvironment.create(
        jax.random.PRNGKey(7), num_items=100, item_dim=16, slate_size=2
    )

    agents = {
        "DQN+LSTM": PearlAgent(
            policy_learner=DeepQLearning(
                training_rounds=2,
                batch_size=128,
                exploration=EGreedyExploration(
                    start_epsilon=0.3, end_epsilon=0.05, warmup_steps=20_000
                ),
                action_representation=IdentityActionRepresentation(),
                history_summarizer=LSTMHistorySummarization(
                    history_length=8, hidden_dim=64, num_layers=1
                ),
            ),
            replay_buffer=BasicReplayBuffer(capacity=50_000),
            track_available_masks=True,
        ),
        "BootstrappedDQN+LSTM": PearlAgent(
            policy_learner=BootstrappedDQN(
                training_rounds=2,
                batch_size=128,
                action_representation=IdentityActionRepresentation(),
                history_summarizer=LSTMHistorySummarization(
                    history_length=8, hidden_dim=64, num_layers=1
                ),
            ),
            replay_buffer=BootstrapReplayBuffer(capacity=50_000, ensemble_size=10),
            track_available_masks=True,
        ),
    }

    for name, agent in agents.items():
        res = online_learning(
            agent, env, num_envs=64, max_steps=100_000,
            learn_every_k_steps=4, learning_starts=2_000, seed=0,
        )
        r = np.asarray(res.episode_returns)
        n = max(len(r) // 10, 20)
        print(
            f"{name}: {len(r)} episodes; "
            f"click-through first {r[:n].mean():.2f} -> last {r[-n:].mean():.2f} "
            f"of {env.episode_length} (random ~{0.47 * env.episode_length:.1f})"
        )


if __name__ == "__main__":
    main()
