"""Pure-JAX PLE game family: Catcher, FlappyBird, Pixelcopter, Pong.

Reference coverage: the PLE gym registrations Catcher-PLE-500-v0 /
FlappyBird-PLE-500-v0 / Pixelcopter-PLE-500-v0 / Pong-PLE-500-v0
(pearl/user_envs/__init__.py:9-51). PuckWorld is tested in
tests/test_atari_and_puckworld.py."""

import jax
import jax.numpy as jnp
import pytest

from pearl_tpu.envs import Catcher, FlappyBird, Pixelcopter, Pong, VectorEnv

ENVS = [Catcher(), FlappyBird(), Pixelcopter(), Pong()]


@pytest.mark.parametrize("env", ENVS, ids=lambda e: type(e).__name__)
def test_shapes_and_jit_rollout(env):
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert obs.shape == env.observation_space.shape
    assert obs.dtype == jnp.float32

    def body(carry, k):
        s, _ = carry
        ka, ks = jax.random.split(k)
        a = env.action_space.sample(ka)
        s, res = env.step(s, a, ks)
        return (s, res.observation), (res.reward, res.terminated)

    keys = jax.random.split(key, 50)
    (_, last_obs), (rews, terms) = jax.lax.scan(body, (state, obs), keys)
    assert last_obs.shape == env.observation_space.shape
    assert rews.shape == (50,)
    assert terms.dtype == jnp.bool_
    assert jnp.all(jnp.isfinite(rews))


@pytest.mark.parametrize("env", ENVS, ids=lambda e: type(e).__name__)
def test_vmap_batch(env):
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    states, obs = jax.vmap(env.reset)(keys)
    assert obs.shape == (8,) + env.observation_space.shape
    acts = jax.vmap(env.action_space.sample)(jax.random.split(jax.random.PRNGKey(2), 8))
    _, res = jax.vmap(env.step)(states, acts, jax.random.split(jax.random.PRNGKey(3), 8))
    assert res.reward.shape == (8,)


def test_catcher_catch_and_miss():
    env = Catcher(fruit_speed=0.5)  # lands every 2 steps
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    # Park the fruit directly above the paddle -> catch.
    s = state.replace(fruit_x=state.player_x, fruit_y=jnp.float32(0.6))
    _, res = env.step(s, jnp.array([2]), key)  # noop
    assert float(res.reward) == 1.0
    # Fruit far from the paddle -> miss, lose a life.
    s = state.replace(fruit_x=jnp.float32(0.95), fruit_y=jnp.float32(0.6),
                      player_x=jnp.float32(0.1))
    s2, res = env.step(s, jnp.array([2]), key)
    assert float(res.reward) == -1.0
    assert int(s2.lives) == env.init_lives - 1
    # Last life -> terminal loss reward -5.
    s = s.replace(lives=jnp.int32(1))
    _, res = env.step(s, jnp.array([2]), key)
    assert float(res.reward) == -5.0
    assert bool(res.terminated)


def test_flappybird_crash_on_ceiling_and_pass_reward():
    env = FlappyBird()
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    # Repeated flaps drive the bird into the ceiling -> crash.
    s, done, r = state, False, 0.0
    for i in range(60):
        s, res = env.step(s, jnp.array([0]), jax.random.fold_in(key, i))
        if bool(res.terminated):
            done, r = True, float(res.reward)
            break
    assert done and r <= -5.0
    # A pipe crossing the bird column this tick yields +1.
    s = state.replace(pipe_x=jnp.array([env.player_x + 0.01, 1.0]),
                      gap_y=jnp.array([0.5, 0.5]),
                      player_y=jnp.float32(0.5), player_vel=jnp.float32(0.0))
    _, res = env.step(s, jnp.array([1]), key)
    assert float(res.reward) >= 1.0


def test_pixelcopter_gate_pass_and_wall_crash():
    env = Pixelcopter()
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    # Gate about to cross with the copter centered in its gap -> +1.
    s = state.replace(gate_x=jnp.float32(0.01), gate_y=state.player_y,
                      phase=jnp.float32(0.0))
    s2, res = env.step(s, jnp.array([1]), key)
    assert float(res.reward) >= 1.0
    assert float(s2.gate_x) > 0.5  # gate recycled ahead
    # Doing nothing forever -> gravity sinks it into the floor.
    s, crashed = state, False
    for i in range(200):
        s, res = env.step(s, jnp.array([1]), jax.random.fold_in(key, i))
        if bool(res.terminated):
            crashed = True
            break
    assert crashed


def test_pong_scoring_and_match_end():
    env = Pong()
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    # Ball exiting on the cpu side -> agent point, +1.
    s = state.replace(ball=jnp.array([0.99, 0.5]), ball_vel=jnp.array([0.05, 0.0]),
                      cpu_y=jnp.float32(0.0))  # cpu parked away from the ball
    s2, res = env.step(s, jnp.array([2]), key)
    assert float(res.reward) == 1.0
    assert int(s2.player_score) == 1
    # Match point ends the episode.
    s = s.replace(player_score=jnp.int32(env.max_score - 1))
    _, res = env.step(s, jnp.array([2]), key)
    assert bool(res.terminated)
    # CPU paddle defends: ball at cpu plane, cpu centered on it -> bounce back.
    s = state.replace(ball=jnp.array([0.96, 0.5]), ball_vel=jnp.array([0.05, 0.0]),
                      cpu_y=jnp.float32(0.5))
    s2, res = env.step(s, jnp.array([2]), key)
    assert float(res.reward) == 0.0
    assert float(s2.ball_vel[0]) < 0.0


def test_vector_env_autoreset_catcher():
    env = Catcher()
    venv = VectorEnv(env, num_envs=16)
    key = jax.random.PRNGKey(0)
    vstate, obs = venv.reset(key)
    for i in range(5):
        acts = jnp.zeros((16, 1), jnp.int32)
        vstate, res, obs = venv.step(vstate, acts, jax.random.fold_in(key, i))
    assert obs.shape == (16, 4)


def test_ple_experiment_preset_and_noisy_safety():
    """ple_experiments() builds every env; the SF variant adds a stochastic
    risky-half-plane reward (reference safety.py:26-34) and emits cost=1."""
    from pearl_tpu.benchmarks.configs import ple_experiments
    from pearl_tpu.envs import PuckWorld, SafetyWrapper

    exp = ple_experiments()
    key = jax.random.PRNGKey(0)
    for name, mk in exp["envs"].items():
        env = mk()
        s, obs = env.reset(key)
        s, res = env.step(s, env.action_space.sample(key), key)
        assert obs.ndim == 1 and jnp.isfinite(res.reward)

    risky = lambda obs, a: obs[..., 0] > -1.0  # always risky
    base = SafetyWrapper(PuckWorld(), risky_fn=risky)
    noisy = SafetyWrapper(PuckWorld(), risky_fn=risky, noisy_reward_sigma=0.5)
    s0, _ = base.reset(key)
    a = base.action_space.sample(key)
    _, r_base = base.step(s0, a, key)
    _, r_noisy = noisy.step(s0, a, key)
    assert float(r_base.cost) == 1.0 and float(r_noisy.cost) == 1.0
    assert float(r_base.reward) != float(r_noisy.reward)
    # Bonus is mean-0.01: averaged over many keys it should be small.
    rs = []
    for i in range(64):
        _, res = noisy.step(s0, a, jax.random.fold_in(key, i))
        rs.append(float(res.reward))
    import numpy as np
    assert abs(np.mean(rs) - float(r_base.reward)) < 0.3


def test_dqn_improves_on_catcher():
    """Learning signal on the PLE family: DQN's catch/miss balance improves
    (full convergence needs a larger budget than CI allows; direction and
    magnitude are asserted instead)."""
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training import online_learning
    import numpy as np

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=2, batch_size=128,
            exploration=EGreedyExploration(
                start_epsilon=0.5, end_epsilon=0.05, warmup_steps=30_000
            ),
        ),
        replay_buffer=BasicReplayBuffer(capacity=50_000),
    )
    res = online_learning(
        agent, Catcher(), num_envs=32, max_steps=120_000,
        learn_every_k_steps=4, learning_starts=2_000, seed=7,
    )
    r = np.asarray(res.episode_returns)
    n = max(len(r) // 10, 20)
    first, last = r[:n].mean(), r[-n:].mean()
    assert last > first + 1.0, (first, last)  # observed -5.8 -> -3.2
