"""Breadth test mirroring the reference's test_agent.py "build every type of
agent and run a short loop" (test/unit/with_pytorch/test_agent.py:1198-1231):
every registry method must train a few steps on its env family and produce a
finite, checkpoint-roundtrippable state."""

import jax
import numpy as np
import pytest

from pearl_tpu.benchmarks.configs import METHODS
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.training import online_learning
from pearl_tpu.utils import tree_allclose
from pearl_tpu.utils.checkpoint import restore, save


def env_for_method(method, agent):
    """The env family each registry row pairs with (mirrors the reference's
    benchmark_config env lists)."""
    if method.env_family == "visual":
        from pearl_tpu.envs import Breakout

        return Breakout()
    if method.env_family == "visual_frames":
        # Single-frame visual env: the agent stacks frames itself
        # (StackingHistorySummarization + VisualReplayBuffer pipeline).
        from pearl_tpu.envs import SyntheticAtari

        return SyntheticAtari(height=12, width=12, frames=1, episode_len=32)
    if agent.store_cost and method.continuous:
        # RC (RCPO) methods learn a cost critic — pair with the cost-emitting
        # env, as the reference pairs RC* methods with gym_avg_torque_cost.
        return Pendulum(emit_torque_cost=True)
    if agent.store_cost:
        # Discrete RC rows: cost = 1 in the risky half-plane (the reference's
        # safety wrapper, wrappers/safety.py).
        from pearl_tpu.envs import SafetyWrapper

        return SafetyWrapper(CartPole(), risky_fn=lambda obs, action: obs[..., 0] > 0.5)
    if method.continuous:
        return Pendulum()
    if agent.track_available_masks:
        # Dynamic-action methods store availability masks — pair with the
        # masked wrapper (reference DynamicActionSpaceWrapper envs).
        from pearl_tpu.envs import DynamicActionSpaceWrapper

        return DynamicActionSpaceWrapper(CartPole(), interval=4, num_masked=1)
    return CartPole()


@pytest.mark.parametrize("name", sorted(METHODS.keys()))
def test_method_trains_and_roundtrips(name, tmp_path):
    method = METHODS[name]
    num_envs = 4
    agent = method.make_agent(num_envs)
    env = env_for_method(method, agent)
    rollout = method.on_policy_rollout
    if rollout is not None:
        # Shrink on-policy rollouts for test speed.
        import dataclasses

        from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer

        rollout = 16
        agent = dataclasses.replace(
            agent,
            replay_buffer=OnPolicyReplayBuffer(
                capacity=rollout * num_envs, num_envs=num_envs
            ),
        )
    learn_every = rollout if rollout is not None else 8
    res = online_learning(
        agent,
        env,
        num_envs=num_envs,
        max_steps=learn_every * num_envs * 3,
        learn_every_k_steps=learn_every,
        learning_starts=0 if rollout is not None else 32,
        seed=0,
    )
    state = res.agent_state
    assert int(state.learner.step) > 0, name
    for leaf in jax.tree.leaves(state.learner):
        assert np.isfinite(np.asarray(leaf)).all(), name
    # Checkpoint round-trip of the WHOLE AgentState — learner, safety state
    # (RC lambda/cost critic), replay ring contents, history carries
    # (reference test_serialization.py parity).
    path = str(tmp_path / "ckpt")
    save(path, state)
    restored = restore(path, state)
    assert tree_allclose(restored, state), name


def test_dynamic_action_experiment_preset():
    """dynamic_action_experiments() (reference *_dynamic method dicts +
    DynamicActionSpaceWrapper): each method trains a few steps on the
    masked env with availability masks stored in replay."""
    from pearl_tpu.benchmarks.configs import dynamic_action_experiments

    exp = dynamic_action_experiments()
    env = exp["envs"]["DynamicAcrobot"]()
    for name, method in exp["methods"].items():
        agent = method.make_agent(4)
        assert agent.track_available_masks, name
        res = online_learning(
            agent, env, num_envs=4, max_steps=96,
            learn_every_k_steps=8, learning_starts=32, seed=0,
        )
        state = res.agent_state
        assert int(state.learner.step) > 0, name
        # Replay stored real (non-trivial) availability masks. (SARSA is
        # on-policy — its buffer is cleared after each learn, so the ring can
        # legitimately be empty at the exact end of the run.)
        n = int(state.replay.size)
        if n > 0:
            masks = np.asarray(state.replay.storage.curr_available_mask)
            assert masks[:n].all(axis=1).mean() < 1.0, name


def test_rc_constrained_experiment_preset():
    """rc_constrained_experiments() (reference RC experiment grids,
    benchmark_config.py:1160-1461): constraint values are threaded into the
    safety module and each grid cell trains."""
    from pearl_tpu.benchmarks.configs import rc_constrained_experiments
    from pearl_tpu.training import online_learning

    exp = rc_constrained_experiments()
    env = exp["envs"]["PendulumCost"]()
    # ALL 9 grid cells (3 methods x 3 constraint values).
    assert len(exp["methods"]) == 9
    for name, method in exp["methods"].items():
        agent = method.make_agent(4)
        assert agent.safety_module.constraint_value == float(
            name.split("-c")[1]
        ), name
        res = online_learning(
            agent, env, num_envs=4, max_steps=96,
            learn_every_k_steps=8, learning_starts=32, seed=0,
        )
        state = res.agent_state
        assert int(state.learner.step) > 0, name
        # The RC safety state actually updated: lambda is finite and the cost
        # critic's optimizer stepped (its Adam count advanced).
        assert np.isfinite(float(state.safety.lagrangian)), name
        counts = [
            np.asarray(leaf)
            for leaf in jax.tree.leaves(state.safety.critic_opt)
            if np.asarray(leaf).ndim == 0
        ]
        assert any(c > 0 for c in counts), name


def test_visual_experiment_preset_shape():
    from pearl_tpu.benchmarks.configs import METHODS, visual_experiments

    exp = visual_experiments()
    for name in exp["methods"]:
        assert METHODS[name].env_family == "visual", name
