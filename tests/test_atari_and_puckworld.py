"""Atari preprocessing stack (host wrappers) and pure-JAX PuckWorld.

Reference coverage: pearl/user_envs/wrappers/atari_wrappers.py:31-185 and the
PLE PuckWorld registration (pearl/user_envs/__init__.py:9-51). The Atari stack
is tested against a scripted fake ALE-like env (the image has no ROMs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from pearl_tpu.envs import PuckWorld, PartialObservabilityWrapper, VectorEnv
from pearl_tpu.envs.atari import (
    EpisodicLifeEnv,
    FireResetEnv,
    MaxAndSkipEnv,
    NoopResetEnv,
    wrap_atari,
)


class FakeALE(gymnasium.Env):
    """Deterministic fake: obs = frame counter broadcast to (2, 2); 3 lives;
    life lost every 10 steps; game over after 3 losses. Action 1 is FIRE."""

    def __init__(self):
        self.observation_space = gymnasium.spaces.Box(0, 255, (2, 2), np.float32)
        self.action_space = gymnasium.spaces.Discrete(4)
        self.frame = 0
        self.lives_left = 3
        self.calls = {"reset": 0, "step": 0}

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "LEFT", "RIGHT"]

    def _obs(self):
        return np.full((2, 2), float(self.frame), np.float32)

    def reset(self, *, seed=None, options=None):
        super().reset(seed=seed)
        self.calls["reset"] += 1
        self.frame = 0
        self.lives_left = 3
        return self._obs(), {"lives": self.lives_left}

    def step(self, action):
        self.calls["step"] += 1
        self.frame += 1
        if self.frame % 10 == 0:
            self.lives_left -= 1
        terminated = self.lives_left <= 0
        return self._obs(), 1.0, terminated, False, {"lives": self.lives_left}


def test_noop_reset_advances_frames():
    env = NoopResetEnv(FakeALE(), noop_max=5)
    obs, _ = env.reset(seed=0)
    # Between 1 and 5 noop steps were taken after the raw reset.
    assert 1 <= obs[0, 0] <= 5


def test_fire_reset_presses_fire():
    raw = FakeALE()
    env = FireResetEnv(raw, fire_action=1)
    obs, _ = env.reset(seed=0)
    assert raw.calls["step"] == 1  # exactly one FIRE step
    assert obs[0, 0] == 1.0


def test_max_and_skip_sums_rewards_and_maxes_frames():
    env = MaxAndSkipEnv(FakeALE(), skip=4)
    env.reset(seed=0)
    obs, reward, term, trunc, _ = env.step(0)
    assert reward == 4.0  # 4 x reward 1
    assert obs[0, 0] == 4.0  # max of frames 3 and 4


def test_episodic_life_terminates_per_life_but_resets_on_game_over():
    raw = FakeALE()
    env = EpisodicLifeEnv(raw)
    env.reset(seed=0)
    terms = []
    for _ in range(10):
        _, _, terminated, _, info = env.step(0)
        terms.append(bool(terminated))
    assert terms[-1] and not any(terms[:-1])  # life lost exactly at step 10
    # reset() after a life loss must NOT reset the emulator (game not over).
    resets_before = raw.calls["reset"]
    env.reset()
    assert raw.calls["reset"] == resets_before
    # Exhaust remaining lives -> real game over -> real reset.
    done = False
    for _ in range(40):
        _, _, terminated, truncated, _ = env.step(0)
        if terminated or truncated:
            if env.was_real_done:
                done = True
                break
            env.reset()
    assert done
    env.reset()
    assert raw.calls["reset"] == resets_before + 1


def test_wrap_atari_stack_composes_and_runs():
    env = wrap_atari(FakeALE(), noop_max=3, skip=2)
    obs, _ = env.reset(seed=1)
    assert obs.shape == (2, 2)
    for _ in range(5):
        obs, reward, terminated, truncated, _ = env.step(0)
        if terminated or truncated:
            env.reset()
    # FIRE exists in the fake's meanings -> FireResetEnv applied on top.
    assert isinstance(env, FireResetEnv)


def test_puckworld_shapes_and_reward_sign():
    env = PuckWorld()
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert obs.shape == (8,)
    state, result = jax.jit(env.step)(state, jnp.array([2]), key)
    assert result.observation.shape == (8,)
    assert float(result.reward) <= 0.0  # -distance (+ penalty) is never positive
    assert not bool(result.terminated)


def test_puckworld_agent_moves_and_walls_clamp():
    env = PuckWorld()
    state, _ = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    step = jax.jit(env.step)
    for _ in range(200):  # push right long enough to hit the wall
        state, _ = step(state, jnp.array([2]), key)
    assert float(state.pos[0]) == 1.0
    assert float(state.vel[0]) == 0.0  # wall zeroes the velocity component


def test_puckworld_good_target_relocates():
    env = PuckWorld(good_relocate_steps=5, max_steps=100)
    state, _ = env.reset(jax.random.PRNGKey(3))
    g0 = np.asarray(state.good)
    step = jax.jit(env.step)
    for i in range(5):
        state, _ = step(state, jnp.array([0]), jax.random.PRNGKey(10 + i))
    assert not np.allclose(np.asarray(state.good), g0)


def test_puckworld_vectorizes_and_partial_obs():
    env = PartialObservabilityWrapper(PuckWorld(), observed_indices=(0, 1, 4, 5, 6, 7))
    venv = VectorEnv(env, 8)
    states, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 6)
    states, result, next_obs = venv.step(
        states, jnp.zeros((8, 1), jnp.int32), jax.random.PRNGKey(1)
    )
    assert next_obs.shape == (8, 6)
    assert result.reward.shape == (8,)


def test_agent_host_loop_runs_gym_and_device_envs():
    """agent_online_learning_host: full PearlAgent (jitted, batch=1) driving a
    host env — the Atari topology. Exercised on the Gymnasium adapter and on
    a pure-JAX env through the same code path."""
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.envs import CartPole
    from pearl_tpu.envs.gym_adapter import GymEnvironment
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import agent_online_learning_host

    def make_agent():
        return PearlAgent(
            policy_learner=DeepQLearning(training_rounds=1, batch_size=16),
            replay_buffer=BasicReplayBuffer(capacity=512),
        )

    rets = agent_online_learning_host(
        make_agent(), GymEnvironment("CartPole-v1"),
        max_steps=300, learn_every_k_steps=8, learning_starts=32, seed=0,
    )
    assert len(rets) >= 1 and all(r >= 1.0 for r in rets)

    rets2 = agent_online_learning_host(
        make_agent(), CartPole(),
        max_steps=300, learn_every_k_steps=8, learning_starts=32, seed=0,
    )
    assert len(rets2) >= 1


class FakeALEImage(FakeALE):
    """Image-shaped scripted ALE fake: (20, 20, 3) uint8 frames whose pixel
    intensity tracks the frame counter, so resize/grayscale/stacking have
    real content to transform."""

    def __init__(self):
        super().__init__()
        self.observation_space = gymnasium.spaces.Box(
            0, 255, (20, 20, 3), np.uint8
        )

    def _obs(self):
        return np.full((20, 20, 3), min(self.frame * 7, 255), np.uint8)


def test_atari_host_pipeline_end_to_end():
    """The COMPOSED reference Atari stack (benchmark_config.py:1733-1746):
    NoopReset -> MaxAndSkip -> EpisodicLife -> FireReset -> Resize ->
    Grayscale -> FrameStack -> GymEnvironment -> agent_online_learning_host
    with a CNN-DQN, for a few hundred frames against the scripted fake."""
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.envs.gym_adapter import GymEnvironment
    from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import agent_online_learning_host

    raw = FakeALEImage()
    env = wrap_atari(raw, noop_max=3, skip=2)
    env = gymnasium.wrappers.ResizeObservation(env, (16, 16))
    env = gymnasium.wrappers.GrayscaleObservation(env)
    env = gymnasium.wrappers.FrameStackObservation(env, 2)
    # (stack, H, W) -> channels-last for the CNN.
    env = gymnasium.wrappers.TransformObservation(
        env,
        lambda o: np.transpose(np.asarray(o), (1, 2, 0)),
        gymnasium.spaces.Box(0, 255, (16, 16, 2), np.uint8),
    )
    env = GymEnvironment(env)

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(16, 16, 2),
                out_channels=(8, 8),
                kernel_sizes=(4, 3),
                strides=(2, 1),
                paddings=(0, 0),
                hidden_dims=(32,),
            ),
            training_rounds=1,
            batch_size=16,
        ),
        replay_buffer=BasicReplayBuffer(capacity=512),
    )
    returns = agent_online_learning_host(
        agent, env, max_steps=300, learn_every_k_steps=8,
        learning_starts=64, seed=0,
    )
    # The fake loses a life every 10 raw frames (5 skipped steps), so the
    # EpisodicLife wrapper must have finished several episodes in 300 steps.
    assert len(returns) >= 10
    assert all(np.isfinite(r) for r in returns)
    # The whole stack actually executed: fake was reset + stepped many times.
    assert raw.calls["step"] >= 500  # skip=2 -> 2 raw frames per agent step
    assert raw.calls["reset"] >= 1
