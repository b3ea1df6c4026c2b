"""Coverage for utils (metrics, profiling, pytree) and misc envs/wrappers."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.envs import FixedNumberOfStepsEnvironment, MeanVarBanditEnvironment
from pearl_tpu.envs.wrappers import FlattenObservations
from pearl_tpu.utils.metrics import MetricsLogger, normalized_score
from pearl_tpu.utils.profiling import timed
from pearl_tpu.utils.pytree import soft_update, tree_select


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m" / "log.jsonl")
    logger = MetricsLogger(path)
    logger.log(1, {"loss": jnp.float32(0.5)})
    logger.log(2, {"loss": 0.25, "return": 10})
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["return"] == 10.0


def test_normalized_score():
    assert normalized_score(-250, random_score=-1200, expert_score=-150) > 90
    assert normalized_score(-1200, -1200, -150) == 0.0
    assert normalized_score(5, 5, 5) == 0.0  # degenerate range


def test_timed_measures_jitted_fn():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    dt = timed(f, x, warmup=1, iters=3)
    assert dt > 0


def test_soft_update_and_tree_select():
    a = {"w": jnp.zeros(3)}
    b = {"w": jnp.ones(3)}
    out = soft_update(a, b, 0.25)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.25)
    sel = tree_select(jnp.array([True, False, True]), b["w"], a["w"])
    np.testing.assert_allclose(np.asarray(sel), [1.0, 0.0, 1.0])


def test_fixed_steps_env_truncates():
    env = FixedNumberOfStepsEnvironment(number_of_steps=3)
    state, obs = env.reset(jax.random.PRNGKey(0))
    for i in range(3):
        state, result = env.step(state, jnp.array([1.0]), jax.random.PRNGKey(i))
    assert bool(result.truncated)
    assert float(result.reward) == 1.0  # reward equals the chosen action


def test_mean_var_bandit_arms():
    env = MeanVarBanditEnvironment()
    state, _ = env.reset(jax.random.PRNGKey(0))
    safe = [
        float(env.step(state, jnp.array([0.0]), jax.random.PRNGKey(i))[1].reward)
        for i in range(50)
    ]
    risky = [
        float(env.step(state, jnp.array([1.0]), jax.random.PRNGKey(i))[1].reward)
        for i in range(50)
    ]
    assert np.std(safe) < 1e-6 and np.isclose(np.mean(safe), 1.0)
    assert np.std(risky) > 1.0  # high variance arm


def test_flatten_observations_wrapper():
    import dataclasses
    from pearl_tpu.envs import CartPole

    class DictObsEnv(CartPole):
        def reset(self, key):
            state, obs = super().reset(key)
            return state, {"pos": obs[:2], "vel": obs[2:]}

        def step(self, state, action, key):
            state, result = super().step(state, action, key)
            obs = result.observation
            return state, result.replace(
                observation={"pos": obs[:2], "vel": obs[2:]}
            )

    env = FlattenObservations(env=DictObsEnv(), flat_dim=4)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4,)
    state, result = env.step(state, jnp.array([1.0]), jax.random.PRNGKey(1))
    assert result.observation.shape == (4,)
