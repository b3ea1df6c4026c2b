"""Host-side step-at-a-time training loop.

The faithful equivalent of the reference's `run_episode`/`online_learning`
Python loop (pearl/utils/functional_utils/train_and_eval/online_learning.py:
238-322) — one env instance, one step per Python iteration. ONLY for:

- parity checks against real Gymnasium dynamics (envs/gym_adapter.py),
- host-only learners (DictTabularQLearning).

Production training uses the compiled vectorized drivers in
pearl_tpu.training.online — this loop is orders of magnitude slower by
construction.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def run_episode_host(
    env,
    learner,
    *,
    learn: bool = True,
    exploit: bool = False,
    max_steps: int = 10_000,
    seed: Optional[int] = None,
) -> float:
    """One episode with a host learner exposing the DictTabularQLearning-style
    act/learn API. Returns the episode return."""
    num_actions = env.action_space.n
    _, obs = env.reset(seed=seed) if hasattr(env, "_gym") else env.reset(None)
    obs = np.asarray(obs)
    total = 0.0
    state = None
    for _ in range(max_steps):
        action = learner.act(obs, num_actions, exploit=exploit)
        state, result = env.step(state, np.asarray([float(action)]))
        next_obs = np.asarray(result.observation)
        reward = float(result.reward)
        terminated = bool(result.terminated)
        if learn:
            learner.learn(obs, action, reward, next_obs, terminated, num_actions)
        total += reward
        obs = next_obs
        if terminated or bool(result.truncated):
            break
    return total


def online_learning_host(
    env,
    learner,
    *,
    number_of_episodes: int = 100,
    learn: bool = True,
    seed: int = 0,
) -> List[float]:
    """N episodes; returns per-episode returns (reference online_learning)."""
    returns = []
    for ep in range(number_of_episodes):
        returns.append(
            run_episode_host(env, learner, learn=learn, seed=seed + ep)
        )
    return returns


def agent_online_learning_host(
    agent,
    env,
    *,
    max_steps: int = 100_000,
    learn_every_k_steps: int = 4,
    learning_starts: int = 0,
    seed: int = 0,
    exploit: bool = False,
    learn: bool = True,
    verbose: bool = False,
) -> List[float]:
    """Full PearlAgent (device-side, jitted) driving a HOST environment —
    the standard Atari topology: emulator on host, act/observe/learn compiled
    on the accelerator with a batch axis of 1 (reference equivalent:
    online_learning over GymEnvironment, online_learning.py:72-166).

    For on-device envs use `pearl_tpu.training.online_learning`, which is
    orders of magnitude faster; this loop pays one host round-trip per step
    by construction. Returns per-episode returns in finish order.
    """
    import jax
    import jax.numpy as jnp

    agent = agent.for_env(env)
    act_fn = jax.jit(agent.act, static_argnames=("exploit",))
    observe_fn = jax.jit(agent.observe)
    learn_fn = jax.jit(agent.learn)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    env_state, obs = env.reset(seed=seed) if hasattr(env, "_gym") else env.reset(k_init)
    obs = jnp.asarray(obs, jnp.float32).reshape(-1)
    astate = agent.init(k_init, obs.shape[0], 1, obs[None])

    returns: List[float] = []
    ep_ret = 0.0
    for step in range(max_steps):
        key, k_act, k_env, k_obs, k_learn = jax.random.split(key, 5)
        astate, choice = act_fn(astate, k_act, exploit=exploit)
        action = np.asarray(choice.action[0])
        env_state, result = env.step(env_state, action, k_env) if not hasattr(
            env, "_gym"
        ) else env.step(env_state, action)
        next_obs = jnp.asarray(result.observation, jnp.float32).reshape(-1)
        batched = jax.tree.map(
            lambda x: None if x is None else jnp.asarray(x)[None],
            result,
            is_leaf=lambda x: x is None,
        )
        astate = observe_fn(astate, batched, next_obs[None], k_obs)
        ep_ret += float(result.reward)
        done = bool(result.terminated) or bool(result.truncated)
        if done:
            returns.append(ep_ret)
            if verbose:
                print(f"step={step} episode={len(returns)} return={ep_ret:.1f}")
            ep_ret = 0.0
            env_state, obs = (
                env.reset(seed=seed + len(returns))
                if hasattr(env, "_gym")
                else env.reset(jax.random.fold_in(key, len(returns)))
            )
        if (
            learn
            and step >= learning_starts
            and (step + 1) % learn_every_k_steps == 0
        ):
            astate, _ = learn_fn(astate, k_learn)
    return returns
