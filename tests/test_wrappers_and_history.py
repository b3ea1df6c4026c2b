"""Wrappers + history summarization end-to-end: partially observable CartPole
with LSTM summarizer, dynamic action spaces with masks through the replay."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import (
    Acrobot,
    CartPole,
    DynamicActionSpaceWrapper,
    MountainCar,
    PartialObservabilityWrapper,
)
from pearl_tpu.history_summarization_modules import (
    LSTMHistorySummarization,
    StackingHistorySummarization,
)
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def test_classic_envs_step():
    for env in (MountainCar(), Acrobot()):
        state, obs = env.reset(jax.random.PRNGKey(0))
        for i in range(5):
            state, result = env.step(
                state, jnp.array([i % 3], jnp.float32), jax.random.PRNGKey(i)
            )
        assert np.isfinite(np.asarray(result.observation)).all()
        assert float(result.reward) <= 0.0


def test_partial_observability_projection():
    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2,)
    assert env.observation_dim == 2


def test_lstm_summarizer_partial_obs_cartpole():
    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=1,
            batch_size=16,
            history_summarizer=LSTMHistorySummarization(
                history_length=4, hidden_dim=16, num_layers=1
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=256),
    )
    res = online_learning(
        agent, env, num_envs=4, max_steps=128, learn_every_k_steps=8,
        learning_starts=32, seed=0,
    )
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    # The LSTM params trained (nonzero gradient flow): params finite.
    leaves = jax.tree.leaves(ls.summarizer_params)
    assert len(leaves) > 0
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # Replay stores flattened history windows: 4 * (2 obs + 2 one-hot action).
    assert res.agent_state.replay.storage.state.shape[-1] == 4 * (2 + 2)


def test_stacking_summarizer_shapes():
    m = StackingHistorySummarization(history_length=3)
    carry = m.init_carry(2, obs_dim=4, action_repr_dim=2)
    obs = jnp.ones((2, 4))
    carry = m.observe(carry, obs, jnp.ones((2, 2)))
    stored = m.stored(carry)
    assert stored.shape == (2, 3 * 6)
    out = m.forward({}, stored)
    assert out.shape == (2, 18)
    # Reset zeroes only done envs.
    carry2 = m.reset_envs(carry, jnp.array([True, False]))
    assert float(jnp.abs(carry2[0]).sum()) == 0.0
    assert float(jnp.abs(carry2[1]).sum()) > 0.0


def test_dynamic_action_space_end_to_end():
    env = DynamicActionSpaceWrapper(env=CartPole(), interval=2, num_masked=1)
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
        replay_buffer=BasicReplayBuffer(capacity=256),
        track_available_masks=True,
    )
    res = online_learning(
        agent, env, num_envs=4, max_steps=128, learn_every_k_steps=8,
        learning_starts=32, seed=0,
    )
    replay = res.agent_state.replay
    masks = np.asarray(replay.storage.next_available_mask)[: int(replay.size)]
    # Some next-states must have action 1 unavailable.
    assert (~masks[:, 1]).sum() > 0
    # Chosen actions always respected the availability mask at act time.
    curr = np.asarray(replay.storage.curr_available_mask)[: int(replay.size)]
    idx = np.asarray(replay.storage.action_index)[: int(replay.size)]
    chosen_avail = curr[np.arange(len(idx)), idx]
    assert chosen_avail.all()


def test_lstm_dqn_learns_partial_obs_cartpole():
    """BASELINE.json config "DQN + LSTM history summarization on partially
    observable CartPole": positions-only observations (velocities hidden,
    reference wrappers/partial_observability.py) — the LSTM must recover the
    velocity state for the agent to balance. Observed 13 -> 206 mean return
    in 100k steps (seed 7)."""
    from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration

    env = PartialObservabilityWrapper(env=CartPole(), observed_indices=(0, 2))
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2,
            batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=20_000
            ),
            history_summarizer=LSTMHistorySummarization(
                history_length=8, hidden_dim=64, num_layers=1
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=50_000),
    )
    res = online_learning(
        agent, env, num_envs=32, max_steps=100_000,
        learn_every_k_steps=4, learning_starts=2_000, seed=7,
    )
    r = np.asarray(res.episode_returns)
    n = max(len(r) // 10, 20)
    assert r[-n:].mean() > 100.0, (r[:n].mean(), r[-n:].mean())


def test_flatten_dict_observations():
    """FlattenDictObservations (reference environments.py:169-224): dict
    observations concatenate in sorted-key order; the flattened space derives
    bounds from Box/Discrete sub-spaces; a DQN agent trains through it."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pearl_tpu.api.spaces import BoxSpace, DiscreteActionSpace, DiscreteSpace
    from pearl_tpu.api.types import ActionResult
    from pearl_tpu.envs import CartPole, FlattenDictObservations
    from pearl_tpu.envs.wrappers import EnvWrapper

    @dataclasses.dataclass(frozen=True, eq=False)
    class DictObsCartPole(EnvWrapper):
        """CartPole re-exposed with a dict observation {pos: 2-d, vel: 2-d,
        flag: Discrete(3)}."""

        @property
        def observation_space(self):
            return {
                "pos": BoxSpace.create(-jnp.ones(2) * 5, jnp.ones(2) * 5),
                "vel": BoxSpace.create(-jnp.ones(2) * 10, jnp.ones(2) * 10),
                "flag": DiscreteSpace.range(3),
            }

        def _dictify(self, obs):
            return {
                "pos": obs[jnp.array([0, 2])],
                "vel": obs[jnp.array([1, 3])],
                "flag": jnp.zeros((1,)),
            }

        def reset(self, key):
            state, obs = self.env.reset(key)
            return state, self._dictify(obs)

        def step(self, state, action, key):
            state, result = self.env.step(state, action, key)
            return state, result.replace(observation=self._dictify(result.observation))

    env = FlattenDictObservations(env=DictObsCartPole(env=CartPole()))
    space = env.observation_space
    assert space.dim == 5  # 2 + 2 + 1, sorted keys: flag, pos, vel
    np.testing.assert_allclose(np.asarray(space.low)[:1], [0.0])  # Discrete low
    np.testing.assert_allclose(np.asarray(space.high)[:1], [2.0])  # n - 1
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (5,)
    state, result = env.step(state, jnp.zeros((1,)), jax.random.PRNGKey(1))
    assert result.observation.shape == (5,)

    # End to end: a DQN agent trains over the flattened dict observation.
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import online_learning

    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=32),
        replay_buffer=BasicReplayBuffer(capacity=512),
    )
    res = online_learning(agent, env, num_envs=4, max_steps=512,
                          learn_every_k_steps=8, learning_starts=64, seed=0)
    assert int(res.agent_state.learner.step) > 0
    assert len(res.episode_returns) > 0
