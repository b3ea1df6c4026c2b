"""Online learning driver (reference:
pearl/utils/functional_utils/train_and_eval/online_learning.py:72-322).

The reference's `while not done: act/step/observe/learn` Python loop becomes a
compiled program: one *chunk* = `learn_every_k_steps` vectorized env steps
(`lax.scan`) followed by one `agent.learn` call, all inside a single jit.
The host loop only orchestrates chunks and collects episode statistics, giving
`target_return_is_reached`-style early stopping (online_learning.py:169-235)
without breaking the device-side hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent
from pearl_tpu.envs.vector import VectorEnv


@dataclasses.dataclass
class OnlineResult:
    episode_returns: np.ndarray  # returns of finished episodes, in finish order
    total_steps: int  # total env steps executed (num_envs * scanned steps)
    agent_state: AgentState
    env_states: object
    reached_target: bool = False


def _make_chunk_fn(agent: PearlAgent, venv: VectorEnv, steps_per_chunk: int, do_learn: bool, exploit: bool):
    def env_step(carry, k):
        astate, env_states, ep_ret = carry
        k_act, k_env, k_obs = jax.random.split(k, 3)
        astate, choice = agent.act(astate, k_act, exploit=exploit)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        astate = agent.observe(astate, result, next_obs, k_obs)
        ep_ret = ep_ret + result.reward
        out = (result.done, ep_ret)
        ep_ret = jnp.where(result.done, 0.0, ep_ret)
        return (astate, env_states, ep_ret), out

    @jax.jit
    def run_chunk(astate, env_states, ep_ret, key):
        keys = jax.random.split(key, steps_per_chunk + 1)
        (astate, env_states, ep_ret), (dones, ep_returns) = jax.lax.scan(
            env_step, (astate, env_states, ep_ret), keys[:-1]
        )
        if do_learn:
            astate, metrics = agent.learn(astate, keys[-1])
        else:
            metrics = {}
        return astate, env_states, ep_ret, dones, ep_returns, metrics

    return run_chunk


def online_learning(
    agent: PearlAgent,
    env,
    *,
    num_envs: int = 16,
    max_steps: int = 100_000,
    learn_every_k_steps: int = 1,
    learning_starts: int = 0,
    seed: int = 0,
    target_return: Optional[float] = None,
    target_window: int = 20,
    exploit: bool = False,
    learn: bool = True,
    agent_state: Optional[AgentState] = None,
    env_states=None,
    verbose: bool = False,
) -> OnlineResult:
    """Run vectorized online learning until `max_steps` total env steps or the
    moving-average episode return over the last `target_window` finished
    episodes reaches `target_return`."""
    agent = agent.for_env(env)
    venv = VectorEnv(env, num_envs)
    key = jax.random.PRNGKey(seed)
    key, k_env, k_agent = jax.random.split(key, 3)
    if env_states is None:
        env_states, obs = venv.reset(k_env)
        if agent_state is None:
            agent_state = agent.init(k_agent, venv.observation_dim, num_envs, obs)
        else:
            # Evaluating a previously trained agent on fresh envs (possibly a
            # different num_envs): rebuild the per-env carries around the
            # learned params.
            summ = agent.policy_learner.history_summarizer
            rep, rep_dim, num_actions = agent._rep_dims(venv.observation_dim)
            carry = summ.init_carry(num_envs, venv.observation_dim, rep_dim)
            carry = summ.observe(carry, obs, None)
            space = agent.policy_learner.action_space
            mask = (
                jnp.ones((num_envs, num_actions), bool) if num_actions else None
            )
            from pearl_tpu.policy_learners.policy_learner import ActionChoice

            agent_state = agent_state.replace(
                history_carry=carry,
                available_mask=mask,
                last_action=ActionChoice(
                    action=jnp.zeros((num_envs, space.action_dim)),
                    index=jnp.zeros((num_envs,), jnp.int32),
                ),
            )

    run_chunk = _make_chunk_fn(agent, venv, learn_every_k_steps, learn, exploit)
    warm_chunk = (
        _make_chunk_fn(agent, venv, learn_every_k_steps, False, exploit)
        if learning_starts > 0
        else None
    )

    ep_ret = jnp.zeros((num_envs,))
    finished: list = []
    total = 0
    reached = False
    while total < max_steps:
        key, k = jax.random.split(key)
        chunk = warm_chunk if (warm_chunk is not None and total < learning_starts) else run_chunk
        agent_state, env_states, ep_ret, dones, ep_returns, _ = chunk(
            agent_state, env_states, ep_ret, k
        )
        total += learn_every_k_steps * num_envs
        d = np.asarray(dones).reshape(-1)
        r = np.asarray(ep_returns).reshape(-1)
        finished.extend(r[d].tolist())
        if verbose and finished:
            window = finished[-target_window:]
            print(
                f"steps={total} episodes={len(finished)} "
                f"avg_return={np.mean(window):.1f}"
            )
        if target_return is not None and len(finished) >= target_window:
            if np.mean(finished[-target_window:]) >= target_return:
                reached = True
                break
    return OnlineResult(
        episode_returns=np.asarray(finished),
        total_steps=total,
        agent_state=agent_state,
        env_states=env_states,
        reached_target=reached,
    )
