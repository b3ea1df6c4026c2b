"""Reward-constrained (RCPO) safety: SAC on Pendulum with a torque-cost
constraint.

Port of the reference's actor_critic_and_rc_safety_module tutorial:
`Pendulum(emit_torque_cost=True)` emits cost = mean(action^2) (the
reference's gym_avg_torque_cost.py wrapper), the RC safety module learns a
twin cost-critic and a Lagrange multiplier lambda, and the actor-critic
learner sees reward - lambda * cost (reference
reward_constrained_safety_module.py:35-212 + actor_critic_base.py:377-383).
Tightening `constraint_value` trades return for lower average torque.

Run:  python examples/rc_safety_pendulum.py
"""

import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.safety_modules import RCSafetyModuleCostCriticContinuousAction
from pearl_tpu.training import online_learning


def run(constraint_value):
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        ),
        replay_buffer=BasicReplayBuffer(capacity=100_000),
        safety_module=RCSafetyModuleCostCriticContinuousAction(
            constraint_value=constraint_value, batch_size=100
        ),
        store_cost=True,
    )
    res = online_learning(
        agent, Pendulum(emit_torque_cost=True), num_envs=16, max_steps=60_000,
        learn_every_k_steps=1, learning_starts=1_000, seed=0,
    )
    n = max(len(res.episode_returns) // 10, 20)
    ret = np.asarray(res.episode_returns)[-n:].mean()
    cost = np.asarray(res.episode_costs)[-n:].mean()
    lam = float(res.agent_state.safety.lagrangian)
    print(
        f"constraint={constraint_value:.2f}: return {ret:8.1f}  "
        f"episode cost {cost:7.2f}  lambda {lam:.3f}"
    )


def main():
    # Loose vs tight torque budget: the tight run should spend less torque.
    for constraint_value in (0.5, 0.05):
        run(constraint_value)


if __name__ == "__main__":
    main()
