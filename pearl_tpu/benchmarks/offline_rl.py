"""Offline-RL benchmark pipeline (reference:
pearl/utils/scripts/benchmark_offline_rl.py:37-357).

The reference script (a) trains/loads a behavior policy, (b) collects raw
transitions at a chosen data quality, (c) trains offline learners (IQL / CQL /
TD3BC-style) on the dataset, and (d) evaluates them, reporting returns
normalized against random/expert anchors. Here the same pipeline runs
end-to-end on device: the behavior agent trains vectorized, collection is the
jitted no-learn driver, and offline training is scanned uniform-sample SGD.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.training import online_learning
from pearl_tpu.training.collect import collect_offline_data
from pearl_tpu.training.offline import offline_evaluation, offline_learning
from pearl_tpu.utils.metrics import normalized_score


def mix_datasets(
    parts: Sequence[TransitionBatch], fractions: Sequence[float], total: int,
) -> TransitionBatch:
    """Interleave dataset slices by fraction (the reference's data-quality
    knob: e.g. 0.5 random + 0.5 expert gives a "medium" dataset)."""
    assert len(parts) == len(fractions)
    takes = [int(round(f * total)) for f in fractions]
    takes[-1] = total - sum(takes[:-1])
    sliced = [
        jax.tree.map(lambda x, n=n: None if x is None else x[:n], p)
        for p, n in zip(parts, takes)
    ]

    def cat(*xs):
        xs = [x for x in xs if x is not None]
        return np.concatenate([np.asarray(x) for x in xs], axis=0) if xs else None

    return jax.tree.map(cat, *sliced, is_leaf=lambda x: x is None)


def buffer_from_batch(batch: TransitionBatch):
    n = int(batch.reward.shape[0])
    buffer = BasicReplayBuffer(capacity=n)
    example = jax.tree.map(lambda x: None if x is None else x[:1], batch)
    state = buffer.init(example)
    return buffer, buffer.push(state, batch)


@dataclasses.dataclass
class OfflineRLResult:
    raw_return: float
    normalized: float  # 0 = random anchor, 100 = expert anchor
    returns: np.ndarray


def run_offline_rl_benchmark(
    env_factory: Callable,
    behavior_agent_factory: Callable[[], PearlAgent],
    offline_agent_factories: Dict[str, Callable[[], PearlAgent]],
    *,
    behavior_steps: int = 100_000,
    dataset_size: int = 50_000,
    expert_fraction: float = 1.0,
    offline_batches: int = 2_000,
    offline_batch_size: int = 128,
    num_envs: int = 16,
    eval_steps: int = 10_000,
    seed: int = 0,
    save_dataset_path: Optional[str] = None,
) -> Dict[str, OfflineRLResult]:
    """Full reference pipeline. Returns per-method results plus the
    "__anchors__" entry holding the measured random/expert returns."""
    env = env_factory()

    # (a) Behavior policy: train online (reference trains or loads one).
    behavior = behavior_agent_factory()
    res = online_learning(
        behavior, env, num_envs=num_envs, max_steps=behavior_steps,
        learn_every_k_steps=4, learning_starts=min(2_000, behavior_steps // 4),
        seed=seed,
    )
    expert_state = res.agent_state.learner

    # Anchor returns: untrained greedy agent vs the trained behavior agent.
    rand_returns = offline_evaluation(
        behavior_agent_factory().for_env(env), None, env,
        num_envs=num_envs, max_steps=eval_steps, seed=seed + 10,
    )
    expert_returns = offline_evaluation(
        behavior, res.agent_state, env,
        num_envs=num_envs, max_steps=eval_steps, seed=seed + 11,
    )
    random_score = float(np.mean(rand_returns)) if len(rand_returns) else 0.0
    expert_score = float(np.mean(expert_returns)) if len(expert_returns) else 0.0

    # (b) Collect the dataset: expert slice + random slice, mixed.
    n_expert = int(round(expert_fraction * dataset_size))
    parts, fracs = [], []
    if n_expert:
        parts.append(
            collect_offline_data(
                behavior, env, num_transitions=n_expert, num_envs=num_envs,
                seed=seed + 1, learner_state=expert_state,
            )
        )
        fracs.append(expert_fraction)
    if dataset_size - n_expert:
        parts.append(
            collect_offline_data(
                behavior_agent_factory(), env,
                num_transitions=dataset_size - n_expert,
                num_envs=num_envs, seed=seed + 2,
            )
        )
        fracs.append(1.0 - expert_fraction)
    dataset = mix_datasets(parts, fracs, dataset_size)
    if save_dataset_path:
        from pearl_tpu.training.offline import save_offline_data

        save_offline_data(save_dataset_path, dataset)
    buffer, buf_state = buffer_from_batch(dataset)

    # (c)+(d) Train each offline learner on the dataset, then evaluate.
    results: Dict[str, OfflineRLResult] = {}
    for name, factory in offline_agent_factories.items():
        agent = factory().for_env(env)
        key = jax.random.PRNGKey(seed + 100)
        obs_dim = env.observation_dim
        obs0 = np.zeros((num_envs, obs_dim), np.float32)
        astate = agent.init(key, obs_dim, num_envs, obs0)
        astate = offline_learning(
            agent, astate, buffer, buf_state,
            number_of_batches=offline_batches, batch_size=offline_batch_size,
            seed=seed + 200,
        )
        returns = offline_evaluation(
            agent, astate, env, num_envs=num_envs, max_steps=eval_steps,
            seed=seed + 300,
        )
        raw = float(np.mean(returns)) if len(returns) else random_score
        results[name] = OfflineRLResult(
            raw_return=raw,
            normalized=normalized_score(raw, random_score, expert_score),
            returns=np.asarray(returns),
        )

    results["__anchors__"] = OfflineRLResult(
        raw_return=expert_score,
        normalized=100.0,
        returns=np.array([random_score, expert_score]),
    )
    return results
