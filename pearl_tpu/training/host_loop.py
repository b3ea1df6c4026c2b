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
