"""conv1-cache act path (ops/conv_cache.py): equivalence with the direct
window conv through real agent steps — resets, pushes, and weight updates
included. The cached path's only numeric deviation is f32 summation
grouping (module docstring), so comparisons are allclose, not bit-equal."""

import jax
import jax.numpy as jnp
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import SyntheticAtari
from pearl_tpu.history_summarization_modules import FrameRingHistorySummarization
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.visual import VisualReplayBuffer
from pearl_tpu.envs.vector import VectorEnv

B, H, W, T = 8, 12, 12, 4


def _agent(conv1_cache):
    return PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(H, W, T),
                kernel_sizes=(4, 2),
                strides=(2, 1),
                hidden_dims=(32,),
                time_major_stack=True,
                conv1_cache=conv1_cache,
            ),
            training_rounds=1,
            batch_size=16,
            history_summarizer=FrameRingHistorySummarization(history_length=T),
        ),
        replay_buffer=VisualReplayBuffer(
            capacity=8 * B, stack=T, num_envs=B, dedup_next=True
        ),
    )


def _env():
    return SyntheticAtari(height=H, width=W, frames=1, episode_len=5)


def _rollout(agent, steps):
    env = _env()
    agent = agent.for_env(env)
    venv = VectorEnv(env, B)
    k = jax.random.PRNGKey(0)
    k_env, k_agent = jax.random.split(k)
    env_states, obs = venv.reset(k_env)
    astate = agent.init(k_agent, venv.observation_dim, B, obs)
    qs, actions = [], []
    for i in range(steps):
        ka, ke, ko, kl = jax.random.split(jax.random.PRNGKey(100 + i), 4)
        subjective = agent.subjective_state(astate)
        q = agent.policy_learner.q_all_for_test(astate.learner, subjective)
        qs.append(q)
        astate, choice = agent.act(astate, ka)
        actions.append(choice.index)
        env_states, result, next_obs = venv.step(env_states, choice.action, ke)
        astate = agent.observe(astate, result, next_obs, ko)
        if i % 3 == 2:
            astate, _ = agent.learn(astate, kl)
    return jnp.stack(qs), jnp.stack(actions)


@pytest.fixture(autouse=True)
def _q_probe():
    """Expose a deterministic Q readout on the learner for the comparison
    (epsilon-greedy act consumes RNG identically either way, but comparing
    raw Q isolates the cache math from exploration)."""
    from pearl_tpu.policy_learners.sequential_decision_making.deep_td import (
        DeepTDLearning,
    )

    def q_all_for_test(self, state, subjective):
        candidates = self.represented_candidates(subjective.shape[0])
        params, subjective, candidates = self._act_cast(
            state.params, subjective, candidates
        )
        return self.q_network.q_all(params, subjective, candidates, None)

    DeepTDLearning.q_all_for_test = q_all_for_test
    yield
    del DeepTDLearning.q_all_for_test


def test_cached_q_matches_direct_through_resets_and_learns():
    q_direct, a_direct = _rollout(_agent(False), 14)
    q_cached, a_cached = _rollout(_agent(True), 14)
    # Same RNG stream, f32 end to end: Q agree to f32 summation-grouping
    # tolerance, and the greedy/explore action streams are identical.
    assert jnp.allclose(q_direct, q_cached, rtol=2e-4, atol=2e-4), (
        jnp.abs(q_direct - q_cached).max()
    )
    assert (a_direct == a_cached).all()


def test_cache_refresh_after_learn_uses_new_weights():
    agent = _agent(True)
    env = _env()
    agent = agent.for_env(env)
    venv = VectorEnv(env, B)
    k_env, k_agent = jax.random.split(jax.random.PRNGKey(3))
    env_states, obs = venv.reset(k_env)
    astate = agent.init(k_agent, venv.observation_dim, B, obs)
    for i in range(6):
        ka, ke, ko = jax.random.split(jax.random.PRNGKey(7 + i), 3)
        astate, choice = agent.act(astate, ka)
        env_states, result, next_obs = venv.step(env_states, choice.action, ke)
        astate = agent.observe(astate, result, next_obs, ko)
    astate2, _ = agent.learn(astate, jax.random.PRNGKey(99))
    net = agent.policy_learner.q_network
    # The refreshed cache must equal a from-scratch recompute with the NEW
    # params — i.e. learn() did not leave stale-weight contributions behind.
    expect = net.refresh_cache(astate2.learner.params, astate2.history_carry)
    assert jnp.allclose(astate2.history_carry.cache, expect, rtol=1e-5, atol=1e-6)
    # And it must differ from the pre-learn cache (weights actually moved).
    assert not jnp.allclose(astate2.history_carry.cache, astate.history_carry.cache)


def test_cache_disabled_paths_unchanged():
    agent = _agent(False)
    env = _env()
    agent = agent.for_env(env)
    venv = VectorEnv(env, B)
    k_env, k_agent = jax.random.split(jax.random.PRNGKey(5))
    env_states, obs = venv.reset(k_env)
    astate = agent.init(k_agent, venv.observation_dim, B, obs)
    assert astate.history_carry.cache is None
