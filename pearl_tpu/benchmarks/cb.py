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
    learn: bool = True,
    exploit: bool = False,
    agent_state=None,
) -> Dict[str, np.ndarray]:
    """Returns per-step mean regret and reward arrays (length `steps`)."""
    agent = agent.for_env(env)
    venv = VectorEnv(env, num_envs)
    key = jax.random.PRNGKey(seed)
    key, k_env, k_agent = jax.random.split(key, 3)
    env_states, obs = venv.reset(k_env)
    if agent_state is None:
        astate = agent.init(k_agent, venv.observation_dim, num_envs, obs)
    else:
        astate = agent_state

    def step_fn(carry, k):
        astate, env_states = carry
        k_act, k_env, k_obs, k_learn = jax.random.split(k, 4)
        astate, choice = agent.act(astate, k_act, exploit=exploit)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        astate = agent.observe(astate, result, next_obs, k_obs)
        if learn:
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
        "agent_state": astate,
    }


# ---------------------------------------------------------------------------
# The reference's UCI CB benchmark protocol
# (run_cb_benchmarks.py:46-332, cb_benchmark_config.py:40-242):
# SquareCB / FastCB over a NeuralBandit and UCB / TS over a NeuralLinearBandit,
# binary action embeddings, online regret over T interactions on
# letter / pendigits / satimage / yeast; plus an offline variant that trains a
# greedy NeuralBandit on uniform-logging-policy data and evaluates regret
# without further training.
# ---------------------------------------------------------------------------


def cb_benchmark_method(name: str, feature_dim: int, num_classes: int, T: int):
    """Build the PearlAgent for one reference CB method row."""
    import math

    from pearl_tpu.action_representation_modules import BinaryActionRepresentation
    from pearl_tpu.policy_learners.contextual_bandits import (
        NeuralBandit,
        NeuralLinearBandit,
    )
    from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
        FastCBExploration,
        SquareCBExploration,
        ThompsonSamplingExplorationLinear,
        UCBExploration,
    )
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer

    bits = max(1, math.ceil(math.log2(max(num_classes, 2))))
    # gamma = 10 * sqrt(T * input_dim) (cb_benchmark_config.py:113-116).
    gamma = 10.0 * math.sqrt(T * (feature_dim + bits))
    rep = BinaryActionRepresentation(bits=bits)
    common = dict(
        hidden_dims=(64, 16),
        learning_rate=0.01,
        batch_size=128,
        training_rounds=10,
        action_representation=rep,
    )
    if name == "NeuralSquareCB":
        learner = NeuralBandit(exploration=SquareCBExploration(gamma=gamma), **common)
    elif name == "NeuralFastCB":
        learner = NeuralBandit(exploration=FastCBExploration(gamma=gamma), **common)
    elif name == "NeuralLinUCB":
        learner = NeuralLinearBandit(exploration=UCBExploration(alpha=1.0), **common)
    elif name == "NeuralLinTS":
        learner = NeuralLinearBandit(
            exploration=ThompsonSamplingExplorationLinear(), **common
        )
    else:
        raise KeyError(name)
    return PearlAgent(
        policy_learner=learner, replay_buffer=BasicReplayBuffer(capacity=T)
    )


CB_METHODS = ("NeuralSquareCB", "NeuralFastCB", "NeuralLinUCB", "NeuralLinTS")
CB_DATASETS = ("letter", "pendigits", "satimage", "yeast")


def run_cb_benchmark_suite(
    *,
    datasets=CB_DATASETS,
    methods=CB_METHODS,
    T: int = 5_000,
    num_envs: int = 10,
    seed: int = 0,
    data_dir=None,
    verbose: bool = False,
) -> Dict[str, Dict[str, Dict[str, np.ndarray]]]:
    """Online regret protocol over all (dataset, method) pairs. T total
    interactions are spread over `num_envs` vectorized env instances."""
    from pearl_tpu.benchmarks.cb_datasets import get_dataset
    from pearl_tpu.envs.bandit import ClassificationBanditEnvironment

    if T % num_envs != 0:
        raise ValueError(
            f"T={T} must be a multiple of num_envs={num_envs} (interactions "
            "are spread evenly over the vectorized env instances)"
        )
    results: Dict[str, Dict[str, Dict[str, np.ndarray]]] = {}
    for ds in datasets:
        X, y, source = get_dataset(ds, data_dir)
        env = ClassificationBanditEnvironment(features=X, labels=y)
        k = int(y.max()) + 1
        results[ds] = {"_source": source}
        for m in methods:
            agent = cb_benchmark_method(m, X.shape[1], k, T)
            out = run_bandit_benchmark(
                agent, env, num_envs=num_envs, steps=T // num_envs, seed=seed
            )
            results[ds][m] = {
                "cumulative_regret": out["cumulative_regret"] * num_envs,
                "final_avg_regret": float(np.mean(out["regret"][-len(out["regret"]) // 5 :])),
            }
            if verbose:
                print(
                    f"{ds:10s} {m:14s} source={source} cum_regret="
                    f"{results[ds][m]['cumulative_regret'][-1]:8.1f} "
                    f"final_avg_regret={results[ds][m]['final_avg_regret']:.3f}"
                )
    return results


def run_offline_cb_experiment(
    dataset: str,
    *,
    T: int = 10_000,
    train_batches: int = 2_000,
    num_eval_steps: int = 500,
    num_envs: int = 10,
    seed: int = 0,
    data_dir=None,
):
    """The reference's offline CB protocol (run_cb_benchmarks.py:70-152):
    collect T interactions with a uniform logging policy (25% forced-correct
    like the reference's coin_flip==0 branch), train a greedy NeuralBandit on
    the logged data, then evaluate online regret WITHOUT training."""
    import math

    from pearl_tpu.action_representation_modules import BinaryActionRepresentation
    from pearl_tpu.benchmarks.cb_datasets import get_dataset
    from pearl_tpu.envs.bandit import ClassificationBanditEnvironment
    from pearl_tpu.policy_learners.contextual_bandits import NeuralBandit
    from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
        UCBExploration,
    )
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.replay_buffers.transition import TransitionBatch
    from pearl_tpu.training.offline import offline_learning

    X, y, source = get_dataset(dataset, data_dir)
    env = ClassificationBanditEnvironment(features=X, labels=y)
    k = int(y.max()) + 1
    bits = max(1, math.ceil(math.log2(max(k, 2))))

    # Uniform logging policy with the reference's 25% forced-correct actions.
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, X.shape[0], T)
    actions = rng.randint(0, k, T).astype(np.int32)
    forced = rng.rand(T) < 0.25
    actions[forced] = y[rows[forced]]
    rewards = (actions == y[rows]).astype(np.float32)
    batch = TransitionBatch(
        state=jnp.asarray(X[rows]),
        action=jnp.asarray(actions[:, None], jnp.float32),
        reward=jnp.asarray(rewards),
        next_state=jnp.asarray(X[rows]),
        terminated=jnp.ones((T,), bool),
        truncated=jnp.zeros((T,), bool),
        action_index=jnp.asarray(actions),
        weight=jnp.ones((T,)),
    )
    buffer = BasicReplayBuffer(capacity=T)
    example = jax.tree.map(lambda x: x[:1] if x is not None else None, batch)
    buf_state = buffer.push(buffer.init(example), batch)

    agent = PearlAgent(
        policy_learner=NeuralBandit(
            hidden_dims=(64, 16),
            learning_rate=0.01,
            batch_size=128,
            training_rounds=1,
            exploration=UCBExploration(alpha=0.0),  # greedy (NoExploration)
            action_representation=BinaryActionRepresentation(bits=bits),
        ),
        replay_buffer=BasicReplayBuffer(capacity=num_envs),
    ).for_env(env)
    astate = agent.init(
        jax.random.PRNGKey(seed), X.shape[1], num_envs, jnp.asarray(X[:num_envs])
    )
    astate = offline_learning(
        agent, astate, buffer, buf_state,
        number_of_batches=train_batches, batch_size=128, seed=seed,
        log_every=min(500, train_batches),
    )
    out = run_bandit_benchmark(
        agent, env, num_envs=num_envs, steps=num_eval_steps, seed=seed + 1,
        learn=False, exploit=True, agent_state=astate,
    )
    return {
        "source": source,
        "final_avg_regret": float(np.mean(out["regret"])),
        "cumulative_regret": out["cumulative_regret"] * num_envs,
    }
