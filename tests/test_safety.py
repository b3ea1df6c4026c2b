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


def test_safety_module_injection_and_compatibility_check():
    """Agent-level safety wiring (reference pearl_agent.py:84-97 +
    compatibility_checks.py:19-31): a risk-sensitive module reaches the
    distributional learner; the default resolves to the learner's own module;
    an incompatible module is a TypeError, never silently ignored."""
    import pytest

    from pearl_tpu.policy_learners.sequential_decision_making import (
        QuantileRegressionDeepQLearning,
    )
    from pearl_tpu.safety_modules import (
        IdentitySafetyModule,
        QuantileNetworkMeanVarianceSafetyModule,
        RiskNeutralSafetyModule,
    )

    mv = QuantileNetworkMeanVarianceSafetyModule(variance_weighting_coefficient=0.7)
    agent = PearlAgent(
        policy_learner=QuantileRegressionDeepQLearning(), safety_module=mv
    )
    assert agent.policy_learner.safety is mv

    default = PearlAgent(policy_learner=QuantileRegressionDeepQLearning())
    assert isinstance(default.safety_module, RiskNeutralSafetyModule)
    assert default.safety_module is default.policy_learner.safety

    with pytest.raises(TypeError):
        PearlAgent(
            policy_learner=QuantileRegressionDeepQLearning(),
            safety_module=RCSafetyModuleCostCriticContinuousAction(),
        )

    # Non-distributional learners are unaffected by an identity module.
    plain = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(),
        safety_module=IdentitySafetyModule(),
    )
    assert isinstance(plain.safety_module, IdentitySafetyModule)


def test_offline_rc_learns_cost_critic_and_lambda():
    """Offline RC training: `PearlAgent.learn_batch` applies the RC batch
    transform (reward - lambda*cost) and the RC module's `learn_batch` trains
    the cost critic + lambda (the reference's learn_batch is a stub,
    reward_constrained_safety_module.py:221-228 — this is the VERDICT-required
    extension)."""
    from pearl_tpu.training.offline import offline_learning, transitions_from_arrays

    rng = np.random.RandomState(0)
    n = 512
    batch = transitions_from_arrays(
        state=rng.randn(n, 3).astype(np.float32),
        action=rng.uniform(-2, 2, (n, 1)).astype(np.float32),
        reward=-np.abs(rng.randn(n)).astype(np.float32),
        next_state=rng.randn(n, 3).astype(np.float32),
        terminated=np.zeros((n,), bool),
        action_index=np.zeros((n,), np.int32),
        cost=np.abs(rng.randn(n)).astype(np.float32) + 0.5,  # every step costly
    )
    env = Pendulum()
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(),
        safety_module=RCSafetyModuleCostCriticContinuousAction(
            constraint_value=0.01, lr_lambda=0.1
        ),
        store_cost=True,
    ).for_env(env)
    astate = agent.init(jax.random.PRNGKey(0), 3, 1, np.zeros((1, 3), np.float32))
    critic0 = jax.tree.leaves(astate.safety.critic_params)[0].copy()

    buffer = BasicReplayBuffer(capacity=n)
    example = jax.tree.map(lambda x: x[:1] if x is not None else None, batch)
    buf_state = buffer.push(buffer.init(example), batch)
    astate = offline_learning(
        agent, astate, buffer, buf_state,
        number_of_batches=50, batch_size=64, log_every=25,
    )
    lam = float(astate.safety.lagrangian)
    assert lam > 0.0  # costs exceed the tiny constraint -> lambda grew
    critic1 = jax.tree.leaves(astate.safety.critic_params)[0]
    assert not np.allclose(np.asarray(critic0), np.asarray(critic1))  # trained


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
