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


def test_online_learning_reports_cost_and_risky_metrics():
    """Reference run_episode returns `return_cost` and `risky_sa_ratio`
    (online_learning.py:312-321); our OnlineResult carries them per episode."""
    import numpy as np
    from pearl_tpu.envs import CartPole, SafetyWrapper
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import online_learning

    # Risky whenever the cart is right of center.
    env = SafetyWrapper(CartPole(), risky_fn=lambda obs, a: obs[0] > 0.0)
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=2048),
    )
    res = online_learning(agent, env, num_envs=8, max_steps=4_000, seed=3)
    assert len(res.episode_costs) == len(res.episode_returns) > 0
    assert len(res.episode_risky_ratios) == len(res.episode_returns)
    # Ratios are valid probabilities and costs equal risky-step counts here.
    assert np.all(res.episode_risky_ratios >= 0.0)
    assert np.all(res.episode_risky_ratios <= 1.0)
    assert res.episode_costs.sum() > 0  # some states were right of center
