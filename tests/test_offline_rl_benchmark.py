"""Offline-RL benchmark pipeline (reference:
pearl/utils/scripts/benchmark_offline_rl.py:37-357): behavior training →
mixed-quality dataset → offline training → normalized-score evaluation."""

import numpy as np
import jax

from pearl_tpu.agent import PearlAgent
from pearl_tpu.benchmarks import mix_datasets, run_offline_rl_benchmark
from pearl_tpu.envs import Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
    ImplicitQLearning,
    TD3BC,
)
from pearl_tpu.training.offline import transitions_from_arrays


def test_mix_datasets_fractions():
    def mk(v, n):
        return transitions_from_arrays(
            state=np.full((n, 3), v, np.float32),
            action=np.zeros((n, 1), np.float32),
            reward=np.full((n,), v, np.float32),
            next_state=np.zeros((n, 3), np.float32),
            terminated=np.zeros((n,), bool),
        )

    mixed = mix_datasets([mk(1.0, 100), mk(2.0, 100)], [0.25, 0.75], 100)
    assert mixed.reward.shape == (100,)
    assert float((mixed.reward == 1.0).sum()) == 25
    assert float((mixed.reward == 2.0).sum()) == 75


def test_offline_rl_pipeline_end_to_end():
    results = run_offline_rl_benchmark(
        env_factory=Pendulum,
        behavior_agent_factory=lambda: PearlAgent(
            policy_learner=ContinuousSoftActorCritic(
                training_rounds=1, batch_size=64
            )
        ),
        offline_agent_factories={
            "IQL": lambda: PearlAgent(
                policy_learner=ImplicitQLearning(training_rounds=1, batch_size=64)
            ),
            "TD3BC": lambda: PearlAgent(
                policy_learner=TD3BC(training_rounds=1, batch_size=64)
            ),
        },
        behavior_steps=2_048,
        dataset_size=1_024,
        expert_fraction=0.5,
        offline_batches=100,
        offline_batch_size=64,
        num_envs=8,
        eval_steps=1_600,
        seed=0,
    )
    anchors = results.pop("__anchors__")
    rand_score, expert_score = anchors.returns
    assert np.isfinite(rand_score) and np.isfinite(expert_score)
    for name, r in results.items():
        assert np.isfinite(r.raw_return), name
        assert len(r.returns) > 0, name
        # Pendulum returns live in [-1700, 0]; sanity-bound the raw scores.
        assert -2000.0 < r.raw_return <= 0.0, name
