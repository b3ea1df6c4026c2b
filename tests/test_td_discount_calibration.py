"""TD fixed-point calibration (VERDICT r2 item 8): the learning-signal matrix
freezes targets (terminated=True), so the discount factor is inert there — a
2x-wrong gamma would pass. This test pins the discount against an ANALYTIC
fixed point: on a single-state, never-terminating MDP with reward 1, the
Bellman fixed point is Q* = 1 / (1 - gamma). DQN (hard target updates) must
converge to it; a learner whose learn_batch used a mis-scaled gamma would
converge to the WRONG constant (negative control included).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.api.spaces import DiscreteActionSpace
from pearl_tpu.policy_learners.sequential_decision_making import (
    DeepQLearning,
    DeepSARSA,
    DoubleDQN,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.sarsa import SARSAReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch


def _const_buffer(agent, space, n=64, obs_dim=4, sarsa=False):
    """A buffer whose every row is the SAME non-terminal self-loop transition
    (s0, a0, r=1, s0): the Bellman fixed point is exactly 1/(1-gamma)."""
    s0 = jnp.ones((n, obs_dim)) * 0.5
    extra = {}
    if sarsa:
        extra = {
            "next_action": jnp.zeros((n, space.action_dim)).at[:, 0].set(1.0),
            "next_action_index": jnp.zeros((n,), jnp.int32),
        }
    batch = TransitionBatch(
        state=s0,
        action=jnp.zeros((n, space.action_dim)).at[:, 0].set(1.0),
        reward=jnp.ones((n,)),
        next_state=s0,
        terminated=jnp.zeros((n,), bool),
        truncated=jnp.zeros((n,), bool),
        action_index=jnp.zeros((n,), jnp.int32),
        **extra,
    )
    buf = agent.replay_buffer
    state = buf.init(jax.tree.map(lambda x: x[:1], batch))
    state = buf.push(state, batch)
    if sarsa:
        # SARSA's 1-step pending cache commits row i on push i+1 (with the
        # incoming action as next_action); push the identical batch again so
        # the self-loop transitions land in the ring.
        state = buf.push(state, batch)
    return buf, state


def _fitted_q(learner_cfg, buffer_cfg, gamma, n_learns=800, sarsa=False):
    space = DiscreteActionSpace.discrete(2)
    agent = PearlAgent(policy_learner=learner_cfg, replay_buffer=buffer_cfg)
    learner = agent.policy_learner.bind(space)
    buffer, buf_state = _const_buffer(agent, space, sarsa=sarsa)
    lstate = learner.init(jax.random.PRNGKey(0), 4, space, 2)

    @jax.jit
    def run(ls, bs, key):
        def one(carry, k):
            ls, bs = carry
            ls, bs, _ = learner.learn(ls, buffer, bs, k)
            return (ls, bs), None

        keys = jax.random.split(key, n_learns)
        (ls, bs), _ = jax.lax.scan(one, (ls, bs), keys)
        return ls

    lstate = run(lstate, buf_state, jax.random.PRNGKey(1))
    subj = jnp.ones((1, 4)) * 0.5
    candidates = learner.represented_candidates(1)
    q = learner.q_network.q_all(lstate.params, subj, candidates, None)
    return float(q[0, 0])


def _dqn(gamma):
    return DeepQLearning(
        training_rounds=1,
        batch_size=32,
        learning_rate=3e-3,
        discount_factor=gamma,
        target_update_freq=1,
        soft_update_tau=1.0,
    )


def test_dqn_converges_to_analytic_fixed_point():
    gamma = 0.9
    q = _fitted_q(_dqn(gamma), BasicReplayBuffer(capacity=64), gamma)
    assert abs(q - 1.0 / (1.0 - gamma)) < 0.5, q  # Q* = 10


def test_wrong_discount_is_detected():
    """Negative control: a half-scale discount converges to a very different
    fixed point — the tolerance above would catch a mis-wired gamma."""
    q_wrong = _fitted_q(_dqn(0.45), BasicReplayBuffer(capacity=64), 0.45)
    assert abs(q_wrong - 1.0 / (1.0 - 0.45)) < 0.5, q_wrong  # ~1.82
    assert abs(q_wrong - 10.0) > 5.0  # nowhere near the gamma=0.9 target


def test_double_dqn_and_sarsa_fixed_points():
    gamma = 0.9
    q = _fitted_q(
        DoubleDQN(
            training_rounds=1, batch_size=32, learning_rate=3e-3,
            discount_factor=gamma, target_update_freq=1, soft_update_tau=1.0,
        ),
        BasicReplayBuffer(capacity=64),
        gamma,
    )
    assert abs(q - 10.0) < 0.5, q
    q = _fitted_q(
        DeepSARSA(
            training_rounds=1, batch_size=32, learning_rate=3e-3,
            discount_factor=gamma, target_update_freq=1, soft_update_tau=1.0,
        ),
        SARSAReplayBuffer(capacity=64, num_envs=64),
        gamma,
        sarsa=True,
    )
    assert abs(q - 10.0) < 0.5, q
