"""One (algo, seed) head-to-head run of pearl_tpu (JAX CPU, same machine)."""
import json, sys, time

import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
algo, seed = sys.argv[1], int(sys.argv[2])

import numpy as np
from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic, DeepQLearning, ProximalPolicyOptimization)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning

if algo == "dqn":
    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=4, batch_size=128,
                                     exploration=EGreedyExploration(epsilon=0.05)),
        replay_buffer=BasicReplayBuffer(capacity=10_000))
    env, target, kw = CartPole(), 500.0, dict(
        num_envs=16, max_steps=250_000, learn_every_k_steps=2, learning_starts=500)
elif algo == "ppo":
    num_envs, rollout = 16, 16
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            training_rounds=20, batch_size=64, epsilon=0.1,
            actor_learning_rate=1e-4, critic_learning_rate=1e-4),
        replay_buffer=OnPolicyReplayBuffer(capacity=rollout * num_envs, num_envs=num_envs))
    env, target, kw = CartPole(), 500.0, dict(
        num_envs=num_envs, max_steps=400_000, learn_every_k_steps=rollout, learning_starts=0)
elif algo == "csac":
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3),
        replay_buffer=BasicReplayBuffer(capacity=100_000))
    env, target, kw = Pendulum(), -250.0, dict(
        num_envs=16, max_steps=300_000, learn_every_k_steps=1, learning_starts=1_000)
elif algo == "csac_matched":
    # Update-to-data ratio pinned to the reference's (VERDICT r3 item 6):
    # ref = 50 rounds per 200-step Pendulum episode = 0.25 updates/env-step
    # (test_integration.py:631-657). Here 1 round per 4 env steps (4 envs,
    # learn every step) = 0.25, same batch 100 / entropy 0.1 / lr 1e-3.
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            training_rounds=1, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3),
        replay_buffer=BasicReplayBuffer(capacity=100_000))
    env, target, kw = Pendulum(), -250.0, dict(
        num_envs=4, max_steps=100_000, learn_every_k_steps=1, learning_starts=200)
elif algo == "ppo_matched1":
    # EXACT reference cadence: ONE env, 200-step rollout, 20 rounds x batch
    # 32 per update, default lrs (ppo.py:97-98) — the single-stream config
    # the reference integration test runs (test_integration.py:455-471).
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            training_rounds=20, batch_size=32, epsilon=0.1,
            actor_learning_rate=1e-4, critic_learning_rate=1e-4),
        replay_buffer=OnPolicyReplayBuffer(capacity=200, num_envs=1))
    env, target, kw = CartPole(), 500.0, dict(
        num_envs=1, max_steps=400_000, learn_every_k_steps=200, learning_starts=0)
elif algo == "ppo_matched":
    # Ref PPO: 20 rounds x batch 32 per 200-transition rollout
    # (test_integration.py:455-471). Here 4 envs x 50-step rollouts = the
    # same 200-transition update granularity and ratio.
    num_envs, rollout = 4, 50
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            training_rounds=20, batch_size=32, epsilon=0.1,
            actor_learning_rate=1e-4, critic_learning_rate=1e-4),
        replay_buffer=OnPolicyReplayBuffer(capacity=rollout * num_envs, num_envs=num_envs))
    env, target, kw = CartPole(), 500.0, dict(
        num_envs=num_envs, max_steps=400_000, learn_every_k_steps=rollout, learning_starts=0)
else:
    raise SystemExit(f"unknown algo {algo}")

t0 = time.time()
res = online_learning(agent, env, seed=seed, target_return=target, target_window=20, **kw)
r = res.episode_returns
print(json.dumps({
    "side": "pearl_tpu", "algo": algo, "seed": seed, "reached": bool(res.reached_target),
    "episodes": len(r), "steps": int(res.total_steps),
    "steps_to_target": int(res.total_steps) if res.reached_target else None,
    "first20": float(np.mean(r[:20])), "last20": float(np.mean(r[-20:])),
    "wall_s": round(time.time() - t0, 1)}), flush=True)
