"""Contextual-bandit benchmark driver (reference:
pearl/utils/scripts/cb_benchmark/run_cb_benchmarks.py:46-332).

Tracks cumulative regret over vectorized bandit interactions (the reference
evaluates online regret over 5000 steps on UCI datasets)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent.pearl_agent import PearlAgent
from pearl_tpu.envs.vector import VectorEnv


def run_bandit_benchmark(
    agent: PearlAgent,
    env,
    *,
    num_envs: int = 16,
    steps: int = 5_000,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns per-step mean regret and reward arrays (length `steps`)."""
    agent = agent.for_env(env)
    venv = VectorEnv(env, num_envs)
    key = jax.random.PRNGKey(seed)
    key, k_env, k_agent = jax.random.split(key, 3)
    env_states, obs = venv.reset(k_env)
    astate = agent.init(k_agent, venv.observation_dim, num_envs, obs)

    def step_fn(carry, k):
        astate, env_states = carry
        k_act, k_env, k_obs, k_learn = jax.random.split(k, 4)
        astate, choice = agent.act(astate, k_act)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        astate = agent.observe(astate, result, next_obs, k_obs)
        astate, _ = agent.learn(astate, k_learn)
        regret = result.info.get("regret", jnp.zeros_like(result.reward))
        return (astate, env_states), (jnp.mean(regret), jnp.mean(result.reward))

    @jax.jit
    def run(astate, env_states, key):
        keys = jax.random.split(key, steps)
        (astate, env_states), (regrets, rewards) = jax.lax.scan(
            step_fn, (astate, env_states), keys
        )
        return astate, regrets, rewards

    astate, regrets, rewards = run(astate, env_states, key)
    return {
        "regret": np.asarray(regrets),
        "reward": np.asarray(rewards),
        "cumulative_regret": np.cumsum(np.asarray(regrets)),
    }
