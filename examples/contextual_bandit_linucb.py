"""Contextual bandits: LinUCB / Neural LinTS on a synthetic linear env with
regret tracking (reference tutorial: contextual bandit notebook + UCI
benchmark, pearl/utils/scripts/cb_benchmark/).

Run: python examples/contextual_bandit_linucb.py
"""

from pearl_tpu.agent import PearlAgent
from pearl_tpu.benchmarks.cb import run_bandit_benchmark
from pearl_tpu.envs import LinearSyntheticBanditEnvironment
from pearl_tpu.policy_learners.contextual_bandits import (
    LinearBandit,
    NeuralLinearBandit,
)
from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    ThompsonSamplingExplorationLinear,
    UCBExploration,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer


def main():
    env = LinearSyntheticBanditEnvironment(seed=0)
    methods = {
        "LinUCB": LinearBandit(exploration=UCBExploration(alpha=1.0)),
        "LinTS": LinearBandit(exploration=ThompsonSamplingExplorationLinear()),
        "NeuralLinUCB": NeuralLinearBandit(exploration=UCBExploration(alpha=1.0)),
    }
    for name, learner in methods.items():
        agent = PearlAgent(
            policy_learner=learner, replay_buffer=BasicReplayBuffer(capacity=16)
        )
        out = run_bandit_benchmark(agent, env, num_envs=16, steps=2_000, seed=0)
        print(
            f"{name:14s} cumulative regret: {out['cumulative_regret'][-1]:8.1f}  "
            f"(final per-step regret {out['regret'][-100:].mean():.4f})"
        )


if __name__ == "__main__":
    main()
