"""A 4-seed DQN sweep trained as ONE compiled program (training/population.py).

The reference runs this exact protocol — num_runs=4 seeds per method
(pearl/utils/scripts/benchmark_config.py:1152-1156) — as four OS processes
(benchmark.py:75-118). Here the four members are vmapped over a leading axis
and advance in lockstep on one chip, sharing every compiled kernel.

Run: python examples/population_sweep.py  (add JAX_PLATFORMS=cpu off-TPU)
"""

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import population_learning


def main():
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=49_984),
    )
    pop = population_learning(
        agent,
        CartPole(),
        num_members=4,
        seeds=[42, 43, 44, 45],  # the reference's num_runs=4 protocol
        num_envs=32,
        max_steps=150_000,
        learn_every_k_steps=4,
        learning_starts=2_000,
        # target_return=475.0 would stop when EVERY member's device-side
        # recent-episode statistic is at target simultaneously; note that
        # statistic (mean over all 32 envs' most recent episode) is stricter
        # than the full-stats last-20-episode window, so a fixed budget with
        # per-seed reporting is the fairer sweep protocol.
        verbose=True,
    )
    print(f"\nsteps/member: {pop.total_steps}")
    for m in range(pop.num_members):
        print(
            f"  seed {42 + m}: episodes={int(pop.total_episodes[m])} "
            f"recent_return={pop.recent_returns[m]:.1f}"
        )
    best = int(pop.recent_returns.argmax())
    print(f"best member: seed {42 + best} (unstack via pop.member_state({best}))")


if __name__ == "__main__":
    main()
