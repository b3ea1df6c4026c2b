"""Smoke tests for the actor-critic family (SAC discrete/continuous, DDPG, TD3)."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
    DeepDeterministicPolicyGradient,
    SoftActorCritic,
    TD3,
    TD3BC,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def _run(learner, env, steps=128):
    agent = PearlAgent(
        policy_learner=learner, replay_buffer=BasicReplayBuffer(capacity=512)
    )
    return online_learning(
        agent, env, num_envs=4, max_steps=steps, learn_every_k_steps=8,
        learning_starts=32, seed=0,
    )


def test_sac_discrete_smoke():
    res = _run(SoftActorCritic(training_rounds=1, batch_size=16), CartPole())
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    assert np.isfinite(float(ls.extra.log_alpha))
    # Actor LR must have decayed below its initial value after episode resets.
    lr = float(ls.actor_opt.hyperparams["learning_rate"])
    assert lr <= 1e-3


def test_sac_continuous_smoke():
    res = _run(
        ContinuousSoftActorCritic(training_rounds=1, batch_size=16),
        Pendulum(),
    )
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    assert np.isfinite(float(ls.extra.log_alpha))


def test_ddpg_smoke():
    res = _run(
        DeepDeterministicPolicyGradient(training_rounds=1, batch_size=16),
        Pendulum(),
    )
    assert int(res.agent_state.learner.step) > 0
    # Actions pushed to replay must lie inside the box.
    actions = np.asarray(res.agent_state.replay.storage.action)
    assert np.all(actions >= -2.0 - 1e-5) and np.all(actions <= 2.0 + 1e-5)


def test_td3_delayed_actor_updates():
    res = _run(TD3(training_rounds=1, batch_size=16), Pendulum(), steps=128)
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    assert np.isfinite(np.asarray(jax.tree.leaves(ls.actor_params)[0])).all()


def test_td3bc_smoke():
    res = _run(TD3BC(training_rounds=1, batch_size=16), Pendulum(), steps=96)
    assert int(res.agent_state.learner.step) > 0
