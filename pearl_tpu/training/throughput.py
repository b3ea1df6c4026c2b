"""Fully-compiled actor-learner runner for throughput benchmarking.

Unlike `online_learning` (which returns per-step episode stats to the host
every chunk), this fuses `learns_per_call` x (steps_per_learn env steps +
one learn) into ONE jitted program with only scalar reductions as outputs —
the configuration used to measure env-steps/s against the >=1M steps/s
north star (BASELINE.md).

`deferred_push=True` collects each chunk's transitions in the scan's stacked
outputs (static-index stores) and writes them to the replay ring in ONE
contiguous push of steps_per_learn * num_envs rows — 1/steps_per_learn the
dynamic ring writes of the per-step path, same ring layout whenever
capacity % (steps_per_learn * num_envs) == 0. Requires
`replay_buffer.supports_deferred_push`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pearl_tpu.agent.pearl_agent import PearlAgent
from pearl_tpu.envs.vector import VectorEnv


def make_compiled_runner(
    agent: PearlAgent,
    env,
    *,
    num_envs: int,
    steps_per_learn: int = 8,
    learns_per_call: int = 16,
    learn: bool = True,
    deferred_push: Optional[bool] = None,
):
    """Returns (init_fn, run_fn).

    init_fn(key) -> (agent_state, env_states)
    run_fn(agent_state, env_states, key)
        -> (agent_state, env_states, {"reward_sum", "episodes"}); executes
        steps_per_learn * learns_per_call * num_envs env steps on device.
    """
    agent = agent.for_env(env)
    venv = VectorEnv(env, num_envs)
    if deferred_push is None:
        deferred_push = False
    if deferred_push and not agent.replay_buffer.supports_deferred_push:
        raise ValueError(
            f"{type(agent.replay_buffer).__name__} does not support deferred "
            "(chunk-granular) pushes"
        )

    def init_fn(key):
        k_env, k_agent = jax.random.split(key)
        env_states, obs = venv.reset(k_env)
        agent_state = agent.init(k_agent, venv.observation_dim, num_envs, obs)
        return agent_state, env_states

    def env_step(carry, k):
        astate, env_states = carry
        k_act, k_env, k_obs = jax.random.split(k, 3)
        astate, choice = agent.act(astate, k_act)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        if deferred_push:
            astate, transition, k_push = agent.observe_deferred(
                astate, result, next_obs, k_obs
            )
            extra = (transition, k_push)
        else:
            astate = agent.observe(astate, result, next_obs, k_obs)
            extra = None
        return (astate, env_states), (
            jnp.sum(result.reward),
            jnp.sum(result.done.astype(jnp.int32)),
            extra,
        )

    def learn_chunk(carry, k):
        astate, env_states = carry
        keys = jax.random.split(k, steps_per_learn + 1)
        (astate, env_states), (rew, eps, extra) = jax.lax.scan(
            env_step, (astate, env_states), keys[:-1]
        )
        if deferred_push:
            transitions, push_keys = extra
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), transitions
            )
            replay = agent.replay_buffer.push(astate.replay, flat, push_keys[0])
            astate = astate.replace(replay=replay)
        if learn:
            astate, _ = agent.learn(astate, keys[-1])
        return (astate, env_states), (jnp.sum(rew), jnp.sum(eps))

    # No donation: agent_state contains aliased leaves at init (target
    # params share buffers with online params), which XLA rejects as a
    # double-donation; the per-dispatch input copy is ~10 MB (microseconds).
    @jax.jit
    def run_fn(agent_state, env_states, key):
        keys = jax.random.split(key, learns_per_call)
        (agent_state, env_states), (rew, eps) = jax.lax.scan(
            learn_chunk, (agent_state, env_states), keys
        )
        return agent_state, env_states, {
            "reward_sum": jnp.sum(rew),
            "episodes": jnp.sum(eps),
        }

    return init_fn, run_fn
