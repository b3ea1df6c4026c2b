"""Online learning driver (reference:
pearl/utils/functional_utils/train_and_eval/online_learning.py:72-322).

The reference's `while not done: act/step/observe/learn` Python loop becomes a
compiled program: one *chunk* = `learn_every_k_steps` vectorized env steps
(`lax.scan`) followed by one `agent.learn` call, all inside a single jit.
The host loop only orchestrates chunks and collects episode statistics, giving
`target_return_is_reached`-style early stopping (online_learning.py:169-235)
without breaking the device-side hot path.

Two statistics modes (`stats=`):

- "full" (default): every step's (done, return, cost, risky) for every env is
  packed into one array and fetched per dispatch — exact per-episode curves,
  the mode every test/benchmark consumer uses. Payload is
  4 * steps * num_envs floats per dispatch, which dominates wall-clock at
  very large env counts.
- "summary": episode accounting stays ON DEVICE. The carry tracks each env's
  most recent finished-episode return plus cumulative finished-episode
  aggregates, and the host fetches a 6-float summary per chunk. The early-stop
  window statistic becomes "mean over envs of the most recent finished
  episode" (with num_envs >= target_window this is a moving window of at
  least target_window recent episodes). This is the production/throughput
  mode: the host <-> device traffic per dispatch is O(chunks), independent of
  num_envs and steps.
"""

from __future__ import annotations

import dataclasses
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent
from pearl_tpu.envs.vector import VectorEnv

# Columns of the summary-mode per-chunk stats vector.
_S_TOTAL_FIN = 0  # finished episodes so far (cumulative)
_S_SUM_RET = 1  # sum of finished-episode returns (cumulative)
_S_RECENT = 2  # mean over envs of most recent finished-episode return
_S_SUM_COST = 3  # sum of finished-episode costs (cumulative)
_S_SUM_RISKY = 4  # sum of finished-episode risky ratios (cumulative)
_S_ENVS_FIN = 5  # number of envs with >= 1 finished episode


@dataclasses.dataclass
class OnlineResult:
    episode_returns: np.ndarray  # returns of finished episodes, in finish order
    total_steps: int  # total env steps executed (num_envs * scanned steps)
    agent_state: AgentState
    env_states: object
    reached_target: bool = False
    # Safety metrics, aligned with episode_returns (reference run_episode's
    # `return_cost` / `risky_sa_ratio` info dict, online_learning.py:312-321).
    # All-zero when the env emits no cost.
    episode_costs: np.ndarray = None
    episode_risky_ratios: np.ndarray = None
    # Summary-mode extras (stats="summary"): per-chunk trace of the
    # recent-return statistic (a coarse learning curve) and cumulative
    # episode aggregates. episode_returns is empty in summary mode.
    return_curve: np.ndarray = None
    total_episodes: int = 0
    mean_return: float = 0.0
    mean_cost: float = 0.0  # mean finished-episode cost (summary mode)
    mean_risky_ratio: float = 0.0  # mean finished-episode risky-step ratio


def _make_chunk_fn(
    agent: PearlAgent,
    venv: VectorEnv,
    steps_per_chunk: int,
    do_learn: bool,
    exploit: bool,
    chunks_per_dispatch: int = 1,
    summary: bool = False,
):
    def env_step(carry, k):
        astate, env_states, ep_ret, aux = carry
        ep_cost, ep_risky, ep_len = aux[0], aux[1], aux[2]
        k_act, k_env, k_obs = jax.random.split(k, 3)
        astate, choice = agent.act(astate, k_act, exploit=exploit)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        astate = agent.observe(astate, result, next_obs, k_obs)
        ep_ret = ep_ret + result.reward
        cost = result.cost if result.cost is not None else jnp.zeros_like(result.reward)
        risky = result.info["risky_sa"] if "risky_sa" in result.info else (cost != 0)
        ep_cost = ep_cost + cost
        ep_risky = ep_risky + risky.astype(jnp.float32)
        ep_len = ep_len + 1.0
        done = result.done
        risky_ratio = ep_risky / jnp.maximum(ep_len, 1.0)
        if summary:
            last_ret, envs_fin, agg = aux[3], aux[4], aux[5]
            d = done.astype(jnp.float32)
            last_ret = jnp.where(done, ep_ret, last_ret)
            envs_fin = envs_fin | done
            agg = agg + jnp.stack(
                [
                    jnp.sum(d),
                    jnp.sum(ep_ret * d),
                    jnp.sum(ep_cost * d),
                    jnp.sum(risky_ratio * d),
                ]
            )
            out = None
        else:
            out = (done, ep_ret, ep_cost, risky_ratio)
        ep_ret = jnp.where(done, 0.0, ep_ret)
        ep_cost = jnp.where(done, 0.0, ep_cost)
        ep_risky = jnp.where(done, 0.0, ep_risky)
        ep_len = jnp.where(done, 0.0, ep_len)
        aux = (
            (ep_cost, ep_risky, ep_len, last_ret, envs_fin, agg)
            if summary
            else (ep_cost, ep_risky, ep_len)
        )
        return (astate, env_states, ep_ret, aux), out

    def one_chunk(carry, key):
        astate, env_states, ep_ret, aux = carry
        keys = jax.random.split(key, steps_per_chunk + 1)
        (astate, env_states, ep_ret, aux), outs = jax.lax.scan(
            env_step, (astate, env_states, ep_ret, aux), keys[:-1]
        )
        if do_learn:
            astate, _metrics = agent.learn(astate, keys[-1])
        if summary:
            last_ret, envs_fin, agg = aux[3], aux[4], aux[5]
            n_fin = jnp.sum(envs_fin.astype(jnp.float32))
            recent = jnp.sum(last_ret * envs_fin) / jnp.maximum(n_fin, 1.0)
            stats = jnp.stack([agg[0], agg[1], recent, agg[2], agg[3], n_fin])
        else:
            dones, ep_returns, ep_costs, risky_ratios = outs
            # Pack every host-bound statistic into ONE array: the host loop
            # pays one device->host fetch per dispatch instead of four (each
            # fetch is a full round-trip; see docs/DESIGN.md §4).
            stats = jnp.stack(
                [dones.astype(jnp.float32), ep_returns, ep_costs, risky_ratios]
            )
        return (astate, env_states, ep_ret, aux), stats

    @jax.jit
    def run_chunk(astate, env_states, ep_ret, ep_aux, key):
        if chunks_per_dispatch == 1:
            # Feed the dispatch key straight through so the RNG stream (and
            # therefore every seed-pinned learning curve) is identical to the
            # unbatched driver.
            carry, stats = one_chunk((astate, env_states, ep_ret, ep_aux), key)
            astate, env_states, ep_ret, ep_aux = carry
            return astate, env_states, ep_ret, ep_aux, stats
        keys = jax.random.split(key, chunks_per_dispatch)
        (astate, env_states, ep_ret, ep_aux), stats = jax.lax.scan(
            one_chunk, (astate, env_states, ep_ret, ep_aux), keys
        )
        if not summary:
            # (C, 4, steps, B) -> (4, C*steps, B): chunk-order-preserving.
            stats = jnp.swapaxes(stats, 0, 1).reshape(4, -1, stats.shape[-1])
        return astate, env_states, ep_ret, ep_aux, stats

    return run_chunk


# Memoize chunk programs across online_learning/population_learning calls:
# each call would otherwise build a fresh closure, so the SAME
# (agent, env, shape) config re-traces (and re-loads the compiled
# executable) on every call — several seconds over this container's
# remote-compile tunnel. Keyed on a weakref to the agent (so a dropped
# agent's entry stops pinning its compiled executables and is swept on the
# next insert) and the env (structural equality); bounded FIFO.
_CHUNK_CACHE: "dict" = {}
_CHUNK_CACHE_MAX = 32


def _cached_program(cache_key, build):
    """Memoize `build()` under cache_key; cache_key[0] must be a
    weakref.ref to the owning agent (dead-agent entries are swept)."""
    try:
        fn = _CHUNK_CACHE.get(cache_key)
    except TypeError:  # unhashable env/agent: build uncached
        return build()
    if fn is None:
        fn = build()
        _CHUNK_CACHE[cache_key] = fn
        for k in [k for k in _CHUNK_CACHE if k[0]() is None]:
            del _CHUNK_CACHE[k]
        while len(_CHUNK_CACHE) > _CHUNK_CACHE_MAX:
            _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))
    return fn


def online_learning(
    agent: PearlAgent,
    env,
    *,
    num_envs: int = 16,
    max_steps: int = 100_000,
    learn_every_k_steps: int = 1,
    chunks_per_dispatch: int = 1,
    learning_starts: int = 0,
    seed: int = 0,
    target_return: Optional[float] = None,
    target_window: int = 20,
    exploit: bool = False,
    learn: bool = True,
    agent_state: Optional[AgentState] = None,
    env_states=None,
    verbose: bool = False,
    stats: str = "full",
) -> OnlineResult:
    """Run vectorized online learning until `max_steps` total env steps or the
    moving-average episode return over the last `target_window` finished
    episodes reaches `target_return`.

    `chunks_per_dispatch` fuses that many (env-rollout + learn) chunks into
    one compiled dispatch (the reference's `record_period` analog,
    online_learning.py:110-135): raise it when host dispatch latency
    dominates (e.g. 16+ on TPU); early stopping then has dispatch
    granularity.

    `stats="summary"` keeps episode accounting on device (see module
    docstring) — early stopping stays active, host traffic per dispatch drops
    to O(chunks_per_dispatch) floats."""
    if stats not in ("full", "summary"):
        raise ValueError(f"stats must be 'full' or 'summary', got {stats!r}")
    summary = stats == "summary"
    orig_agent = agent
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

    def chunk_for(do_learn: bool):
        cache_key = (
            weakref.ref(orig_agent), env, num_envs, learn_every_k_steps,
            do_learn, exploit, chunks_per_dispatch, summary,
        )
        return _cached_program(
            cache_key,
            lambda: _make_chunk_fn(
                agent, venv, learn_every_k_steps, do_learn, exploit,
                chunks_per_dispatch, summary,
            ),
        )

    run_chunk = chunk_for(learn)
    warm_chunk = chunk_for(False) if learning_starts > 0 else None

    ep_ret = jnp.zeros((num_envs,))
    ep_aux = (jnp.zeros((num_envs,)), jnp.zeros((num_envs,)), jnp.zeros((num_envs,)))
    if summary:
        ep_aux = ep_aux + (
            jnp.zeros((num_envs,)),  # last finished-episode return per env
            jnp.zeros((num_envs,), bool),  # env finished >= 1 episode
            jnp.zeros((4,)),  # cumulative [n_fin, sum_ret, sum_cost, sum_risky]
        )
    finished: list = []
    finished_costs: list = []
    finished_risky: list = []
    curve: list = []
    last_summary = np.zeros((6,))
    total = 0
    reached = False

    def consume(stats_dev, steps_done):
        """Fetch one dispatch's stats and fold finished episodes in."""
        nonlocal reached, last_summary
        arr = np.asarray(stats_dev)
        if summary:
            rows = arr.reshape(-1, 6)
            curve.extend(rows[:, _S_RECENT].tolist())
            last_summary = rows[-1]
            if verbose:
                print(
                    f"steps={steps_done} episodes={int(last_summary[_S_TOTAL_FIN])} "
                    f"recent_return={last_summary[_S_RECENT]:.1f}"
                )
            if target_return is not None:
                # Gate on BOTH total finished episodes and the number of
                # distinct envs backing the recent-return statistic: without
                # the _S_ENVS_FIN gate a single env finishing target_window
                # short episodes could trip the stop on a one-episode mean.
                hit = (
                    (rows[:, _S_TOTAL_FIN] >= target_window)
                    & (rows[:, _S_ENVS_FIN] >= min(target_window, num_envs))
                    & (rows[:, _S_RECENT] >= target_return)
                )
                if hit.any():
                    reached = True
            return
        d = arr[0].reshape(-1) > 0.5
        finished.extend(arr[1].reshape(-1)[d].tolist())
        finished_costs.extend(arr[2].reshape(-1)[d].tolist())
        finished_risky.extend(arr[3].reshape(-1)[d].tolist())
        if verbose and finished:
            window = finished[-target_window:]
            print(
                f"steps={steps_done} episodes={len(finished)} "
                f"avg_return={np.mean(window):.1f}"
            )
        if target_return is not None and len(finished) >= target_window:
            if np.mean(finished[-target_window:]) >= target_return:
                reached = True

    # Read-behind pipeline: dispatch chunk i+1 before fetching chunk i's
    # stats, so the (async-dispatched) device program runs while the host
    # blocks on the previous chunk's stats transfer. Early stopping therefore
    # lags one dispatch — the extra dispatch's episodes are still folded into
    # the result below.
    pending = None  # (stats_device_array, total_steps_after_that_chunk)
    while total < max_steps and not reached:
        key, k = jax.random.split(key)
        chunk = warm_chunk if (warm_chunk is not None and total < learning_starts) else run_chunk
        agent_state, env_states, ep_ret, ep_aux, stats_dev = chunk(
            agent_state, env_states, ep_ret, ep_aux, k
        )
        total += learn_every_k_steps * num_envs * chunks_per_dispatch
        if pending is not None:
            consume(*pending)
        pending = (stats_dev, total)
    if pending is not None:
        consume(*pending)
    if summary:
        n_ep = int(last_summary[_S_TOTAL_FIN])
        return OnlineResult(
            episode_returns=np.zeros((0,)),
            total_steps=total,
            agent_state=agent_state,
            env_states=env_states,
            reached_target=reached,
            episode_costs=np.zeros((0,)),
            episode_risky_ratios=np.zeros((0,)),
            return_curve=np.asarray(curve),
            total_episodes=n_ep,
            mean_return=float(last_summary[_S_SUM_RET] / max(n_ep, 1)),
            mean_cost=float(last_summary[_S_SUM_COST] / max(n_ep, 1)),
            mean_risky_ratio=float(last_summary[_S_SUM_RISKY] / max(n_ep, 1)),
        )
    return OnlineResult(
        episode_returns=np.asarray(finished),
        total_steps=total,
        agent_state=agent_state,
        env_states=env_states,
        reached_target=reached,
        episode_costs=np.asarray(finished_costs),
        episode_risky_ratios=np.asarray(finished_risky),
    )
