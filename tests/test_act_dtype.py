"""Act-path mixed precision (`DeepTDLearning.act_dtype`).

The fused step's dominant HBM traffic at large num_envs is the acting
forward's activations (docs/DESIGN.md §4). `act_dtype="bfloat16"` casts the
act-path Q forward to bf16 while learning stays f32. These tests pin the
semantics: scores stay f32 and close to the f32 path, greedy choices agree on
(almost) all rows, and learn_batch numerics are bit-identical to act_dtype=None.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch


def _bound_learner(**kw):
    env = CartPole()
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=8, **kw),
        replay_buffer=BasicReplayBuffer(capacity=64),
    ).for_env(env)
    learner = agent.policy_learner
    state = learner.init(jax.random.PRNGKey(0), env.observation_dim, env.action_space, 4)
    return learner, state


def test_bf16_scores_close_and_argmax_agrees():
    learner32, state = _bound_learner()
    learner16 = dataclasses.replace(learner32, act_dtype="bfloat16")

    B = 512
    obs = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
    cand = learner32.represented_candidates(B)
    s32 = learner32._scores(state, obs, cand, None)
    s16 = learner16._scores(state, obs, cand, None)

    assert s16.dtype == jnp.float32  # cast back for exploration/argmax
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.05, rtol=0.05)

    # Greedy agreement except at bf16-scale near-ties.
    a32, a16 = np.argmax(np.asarray(s32), -1), np.argmax(np.asarray(s16), -1)
    disagree = a32 != a16
    assert disagree.mean() < 0.02
    if disagree.any():
        gaps = np.abs(np.diff(np.sort(np.asarray(s32)[disagree], -1), axis=-1))
        assert gaps.max() < 0.05  # only near-ties may flip


def test_bf16_act_runs_and_learn_stays_f32():
    learner16, state = _bound_learner(act_dtype="bfloat16")
    learner32 = dataclasses.replace(learner16, act_dtype=None)

    obs = jax.random.normal(jax.random.PRNGKey(2), (4, 4))
    state2, choice = jax.jit(lambda s, o, k: learner16.act(s, o, None, k))(
        state, obs, jax.random.PRNGKey(3)
    )
    assert choice.index.shape == (4,)

    B = 8
    batch = TransitionBatch(
        state=jax.random.normal(jax.random.PRNGKey(4), (B, 4)),
        action=jnp.tile(jnp.array([[1.0, 0.0]]), (B, 1)),
        reward=jnp.ones((B,)),
        next_state=jax.random.normal(jax.random.PRNGKey(5), (B, 4)),
        terminated=jnp.zeros((B,), bool),
        truncated=jnp.zeros((B,), bool),
        action_index=jnp.zeros((B,), jnp.int32),
    )
    s16, m16 = learner16.learn_batch(state, batch)
    s32, m32 = learner32.learn_batch(state, batch)
    # learn_batch is untouched by act_dtype: identical metrics and params.
    np.testing.assert_array_equal(np.asarray(m16["loss"]), np.asarray(m32["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s16.params,
        s32.params,
    )


def test_bf16_actor_critic_continuous_and_discrete():
    from pearl_tpu.envs import Pendulum
    from pearl_tpu.policy_learners.sequential_decision_making import (
        ContinuousSoftActorCritic,
        SoftActorCritic,
    )

    # Continuous: exploit (mean) actions stay close to the f32 path and in-box.
    env = Pendulum()
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(training_rounds=1, batch_size=8),
        replay_buffer=BasicReplayBuffer(capacity=64),
    ).for_env(env)
    l32 = agent.policy_learner
    l16 = dataclasses.replace(l32, act_dtype="bfloat16")
    state = l32.init(jax.random.PRNGKey(0), env.observation_dim, env.action_space, 4)
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, env.observation_dim))
    _, c32 = l32.act(state, obs, None, jax.random.PRNGKey(2), exploit=True)
    _, c16 = l16.act(state, obs, None, jax.random.PRNGKey(2), exploit=True)
    assert c16.action.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(c16.action), np.asarray(c32.action), atol=0.05
    )
    lo, hi = np.asarray(env.action_space.low), np.asarray(env.action_space.high)
    assert (np.asarray(c16.action) >= lo - 1e-6).all()
    assert (np.asarray(c16.action) <= hi + 1e-6).all()

    # Discrete: policy probs f32 and close; greedy choice matches off near-ties.
    cenv = CartPole()
    cagent = PearlAgent(
        policy_learner=SoftActorCritic(training_rounds=1, batch_size=8),
        replay_buffer=BasicReplayBuffer(capacity=64),
    ).for_env(cenv)
    d32 = cagent.policy_learner
    d16 = dataclasses.replace(d32, act_dtype="bfloat16")
    dstate = d32.init(jax.random.PRNGKey(3), cenv.observation_dim, cenv.action_space, 4)
    dobs = jax.random.normal(jax.random.PRNGKey(4), (256, cenv.observation_dim))
    _, e32 = d32.act(dstate, dobs, None, jax.random.PRNGKey(5), exploit=True)
    _, e16 = d16.act(dstate, dobs, None, jax.random.PRNGKey(5), exploit=True)
    agree = (np.asarray(e32.index) == np.asarray(e16.index)).mean()
    assert agree > 0.98


def test_act_dtype_honored_by_qrdqn_and_bootstrapped():
    """ADVICE r2: subclasses overriding the scoring path must route through
    _act_cast so act_dtype is never a silent no-op."""
    import jax
    import jax.numpy as jnp

    from pearl_tpu.api.spaces import DiscreteActionSpace
    from pearl_tpu.neural_networks.q_value_networks import EnsembleQValueNetwork
    from pearl_tpu.policy_learners.sequential_decision_making import (
        BootstrappedDQN,
        QuantileRegressionDeepQLearning,
    )

    space = DiscreteActionSpace.discrete(2)
    for learner in (
        QuantileRegressionDeepQLearning(act_dtype="bfloat16").bind(space),
        BootstrappedDQN(
            q_network=EnsembleQValueNetwork(ensemble_size=2, hidden_dims=(8,)),
            act_dtype="bfloat16",
        ).bind(space),
    ):
        state = learner.init(jax.random.PRNGKey(0), 4, space, 3)
        # The shared cast helper actually downcasts.
        params, subj = learner._act_cast(state.params, jnp.zeros((3, 4)))
        assert subj.dtype == jnp.bfloat16
        assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(params))
        # And act runs end-to-end with finite f32 outputs.
        _, choice = learner.act(
            state, jnp.ones((3, 4)), None, jax.random.PRNGKey(1)
        )
        assert choice.index.shape == (3,)
