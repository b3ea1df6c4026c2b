"""Safety modules: RC cost-critic + lambda on a cost-emitting Pendulum."""

import jax
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.safety_modules import RCSafetyModuleCostCriticContinuousAction
from pearl_tpu.training import online_learning


def test_rc_safety_module_learns_lambda():
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=1024),
        safety_module=RCSafetyModuleCostCriticContinuousAction(
            constraint_value=0.05, batch_size=32
        ),
        store_cost=True,
    )
    res = online_learning(
        agent,
        Pendulum(emit_torque_cost=True),
        num_envs=4,
        max_steps=256,
        learn_every_k_steps=8,
        learning_starts=64,
        seed=0,
    )
    s = res.agent_state.safety
    lam = float(s.lagrangian)
    assert np.isfinite(lam) and 0.0 <= lam <= 20.0
    assert np.isfinite(np.asarray(jax.tree.leaves(s.critic_params)[0])).all()
    # Costs were stored in replay.
    costs = np.asarray(res.agent_state.replay.storage.cost)
    assert costs.max() > 0.0
