"""Online learning driver (reference:
pearl/utils/functional_utils/train_and_eval/online_learning.py:72-322).

The reference's `while not done: act/step/observe/learn` Python loop becomes a
compiled program: one *chunk* = `learn_every_k_steps` vectorized env steps
(`lax.scan`) followed by one `agent.learn` call, all inside a single jit.
The host loop only orchestrates chunks and collects episode statistics, giving
`target_return_is_reached`-style early stopping (online_learning.py:169-235)
without breaking the device-side hot path.

Three statistics modes (`stats=`):

- "full" (default): every step's (done, return, cost, risky) for every env is
  packed into one array and fetched per dispatch — exact per-episode curves,
  the mode every test/benchmark consumer uses. Payload is
  4 * steps * num_envs floats per dispatch, which dominates wall-clock at
  very large env counts.
- "summary": episode accounting stays ON DEVICE. The carry tracks each env's
  most recent finished-episode return plus cumulative finished-episode
  aggregates, and the host fetches a 6-float summary per chunk. The early-stop
  window statistic becomes "mean over envs of the most recent finished
  episode". Host <-> device traffic per dispatch is O(chunks), independent of
  num_envs and steps.
- "curves": real per-episode returns at production speed — the middle mode
  between "full" (exact but O(steps*envs) payload) and "summary" (cheap but
  one coarse scalar per chunk). Finished-episode (return, cost, risky) tuples
  are scattered into a bounded device-side ring (`curve_capacity` entries) in
  finish order; the host drains the ring once per dispatch — O(episodes)
  payload, bounded by the ring. If more than `curve_capacity` episodes finish
  within one dispatch the oldest are dropped (counted in
  `OnlineResult.episodes_dropped`); early stopping and `episode_returns` are
  otherwise identical to "full" mode (same-seed equality is tested).

Multi-device (`mesh=`): pass a `jax.sharding.Mesh` and the SAME driver —
early stopping, summary/curves accounting, learning_starts — runs data-
parallel over it ("stacked state" pattern, see pearl_tpu/parallel): each
device holds `num_envs / n_devices` env instances and a replay shard, the
learner is replicated (gradients `pmean` over the mesh axis via the learners'
`pmean_axis`) and stays bit-identical across devices, and per-dispatch stats
are folded across the device axis on the host. This is the production
scale-out path (BASELINE.md's aggregate-throughput north star is defined over
this driver); `parallel.DataParallelRunner` remains the minimal lab runner.
"""

from __future__ import annotations

import dataclasses
import warnings
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

_STATS_MODES = ("full", "summary", "curves")


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
    # Curves mode: episodes that finished but were overwritten in the ring
    # before the host drained it (0 unless > curve_capacity episodes finished
    # within a single dispatch).
    episodes_dropped: int = 0


def _make_chunk_fn(
    agent: PearlAgent,
    venv: VectorEnv,
    steps_per_chunk: int,
    do_learn: bool,
    exploit: bool,
    chunks_per_dispatch: int = 1,
    stats_mode="full",
    curve_capacity: int = 4096,
    deferred_push: bool = False,
):
    """Build the RAW (unjitted) chunk program
    `(astate, env_states, ep_ret, ep_aux, key) -> (astate, env_states,
    ep_ret, ep_aux, stats)`. Callers wrap it in jit / vmap / shard_map.
    `stats_mode=True` is accepted as a legacy alias for "summary".

    `deferred_push`: collect the chunk's transitions in the scan's stacked
    outputs and write the ring ONCE per chunk (1/steps_per_chunk the dynamic
    ring writes; bit-identical layout when capacity % (steps*B) == 0)."""
    if stats_mode is True:
        stats_mode = "summary"
    summary = stats_mode == "summary"
    curves = stats_mode == "curves"
    R = curve_capacity

    def env_step(carry, k):
        astate, env_states, ep_ret, aux = carry
        ep_cost, ep_risky, ep_len = aux[0], aux[1], aux[2]
        k_act, k_env, k_obs = jax.random.split(k, 3)
        astate, choice = agent.act(astate, k_act, exploit=exploit)
        env_states, result, next_obs = venv.step(env_states, choice.action, k_env)
        if deferred_push:
            astate, transition, k_push = agent.observe_deferred(
                astate, result, next_obs, k_obs
            )
            deferred_out = (transition, k_push)
        else:
            astate = agent.observe(astate, result, next_obs, k_obs)
            deferred_out = None
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
        elif curves:
            ring, count_mod, count_u32 = aux[3], aux[4], aux[5]
            # Record this step's finished episodes into the (3, R) ring in
            # env order (matching full mode's step-major-then-env drain
            # order). Ring index from a mod-R counter; the lifetime total is a
            # separate uint32 that wraps cleanly (the host accumulates exact
            # deltas modulo 2^32, so multi-hour runs past 2^31 episodes
            # cannot corrupt drain arithmetic).
            ranks = jnp.cumsum(done.astype(jnp.int32))
            K = ranks[-1]
            B = done.shape[0]
            if R >= B:
                # SCATTER-FREE write (round 5): in the full fused step
                # program, XLA:TPU executed the packed row-scatter at
                # 0.83 ms/step — 65% of curves mode — resisting both fusion
                # barriers and layout changes (the same scatter
                # microbenchmarks at 0.01-0.04 ms standalone). Instead:
                # sort-compact the finished episodes to the front (stable:
                # key = finish rank, unique), pad to R, roll so compacted
                # row j lands at slot (count_mod + j) % R, and where-merge
                # into the ring — all dense vector ops (~0.1 ms at 131k
                # envs, the sort dominating). Exactly the scatter's
                # semantics whenever every finisher has a slot
                # (R >= envs_per_dev, the self-consistent config); the
                # scatter path below remains for R < B, where colliding
                # entries are dropped episodes either way (and the driver
                # warns).
                big = jnp.int32(R + B)
                keys = jnp.where(done, ranks - 1, big)
                sk, s_ret, s_cost, s_risky = jax.lax.sort(
                    (keys, ep_ret, ep_cost, risky_ratio), num_keys=1
                )
                pad = R - B
                if pad:
                    z = jnp.zeros((pad,))
                    s_ret = jnp.concatenate([s_ret, z])
                    s_cost = jnp.concatenate([s_cost, z])
                    s_risky = jnp.concatenate([s_risky, z])
                new_rows = jnp.stack([s_ret, s_cost, s_risky])  # (3, R)
                new_rows = jnp.roll(new_rows, count_mod, axis=1)
                slot_j = (jnp.arange(R, dtype=jnp.int32) - count_mod) % R
                ring = jnp.where(slot_j[None, :] < K, new_rows, ring)
            else:
                idx = jnp.where(done, (count_mod + ranks - 1) % R, R)
                vals = jnp.stack([ep_ret, ep_cost, risky_ratio], axis=-1)
                ring = jnp.transpose(
                    jnp.transpose(ring).at[idx].set(vals, mode="drop")
                )
            count_mod = (count_mod + K) % R
            count_u32 = count_u32 + K.astype(jnp.uint32)
            out = None
        else:
            out = (done, ep_ret, ep_cost, risky_ratio)
        out = (out, deferred_out)
        ep_ret = jnp.where(done, 0.0, ep_ret)
        ep_cost = jnp.where(done, 0.0, ep_cost)
        ep_risky = jnp.where(done, 0.0, ep_risky)
        ep_len = jnp.where(done, 0.0, ep_len)
        if summary:
            aux = (ep_cost, ep_risky, ep_len, last_ret, envs_fin, agg)
        elif curves:
            aux = (ep_cost, ep_risky, ep_len, ring, count_mod, count_u32)
        else:
            aux = (ep_cost, ep_risky, ep_len)
        return (astate, env_states, ep_ret, aux), out

    def one_chunk(carry, key):
        astate, env_states, ep_ret, aux = carry
        keys = jax.random.split(key, steps_per_chunk + 1)
        (astate, env_states, ep_ret, aux), (outs, deferred_outs) = jax.lax.scan(
            env_step, (astate, env_states, ep_ret, aux), keys[:-1]
        )
        if deferred_push:
            transitions, push_keys = deferred_outs
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), transitions
            )
            replay = agent.replay_buffer.push(astate.replay, flat, push_keys[0])
            astate = astate.replace(replay=replay)
        if do_learn:
            astate, _metrics = agent.learn(astate, keys[-1])
        if summary:
            last_ret, envs_fin, agg = aux[3], aux[4], aux[5]
            n_fin = jnp.sum(envs_fin.astype(jnp.float32))
            recent = jnp.sum(last_ret * envs_fin) / jnp.maximum(n_fin, 1.0)
            stats = jnp.stack([agg[0], agg[1], recent, agg[2], agg[3], n_fin])
        elif curves:
            stats = aux[5]  # cumulative (uint32) finished count at chunk end
        else:
            dones, ep_returns, ep_costs, risky_ratios = outs
            # Pack every host-bound statistic into ONE array: the host loop
            # pays one device->host fetch per dispatch instead of four (each
            # fetch is a full round-trip; see docs/DESIGN.md §4).
            stats = jnp.stack(
                [dones.astype(jnp.float32), ep_returns, ep_costs, risky_ratios]
            )
        return (astate, env_states, ep_ret, aux), stats

    def run_chunk(astate, env_states, ep_ret, ep_aux, key):
        if chunks_per_dispatch == 1:
            # Feed the dispatch key straight through so the RNG stream (and
            # therefore every seed-pinned learning curve) is identical to the
            # unbatched driver.
            carry, stats = one_chunk((astate, env_states, ep_ret, ep_aux), key)
            astate, env_states, ep_ret, ep_aux = carry
            if curves:
                stats = (stats[None], ep_aux[3])
            return astate, env_states, ep_ret, ep_aux, stats
        keys = jax.random.split(key, chunks_per_dispatch)
        (astate, env_states, ep_ret, ep_aux), stats = jax.lax.scan(
            one_chunk, (astate, env_states, ep_ret, ep_aux), keys
        )
        if curves:
            # Per-chunk cumulative counts + the (carry-resident) ring once
            # per dispatch — the ring is NOT stacked per chunk. The ring is
            # stat-major (3, R) end to end (pad-free layout; see the
            # env_step comment); the host drain un-transposes with a free
            # numpy view.
            stats = (stats, ep_aux[3])
        elif not summary:
            # (C, 4, steps, B) -> (4, C*steps, B): chunk-order-preserving.
            stats = jnp.swapaxes(stats, 0, 1).reshape(4, -1, stats.shape[-1])
        return astate, env_states, ep_ret, ep_aux, stats

    return run_chunk


def _mesh_wrap(run_chunk, mesh, axis):
    """Lift the raw chunk program over a device mesh ("stacked state"
    pattern): every carry leaf gains a leading device axis sharded over
    `axis`; each shard strips it, runs the per-device program with its own
    key, and re-stacks. Stats come back with a leading device axis for the
    host to fold."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.devices.size)

    def per_shard(astate, env_states, ep_ret, ep_aux, keys):
        carry = jax.tree.map(lambda x: x[0], (astate, env_states, ep_ret, ep_aux))
        out = run_chunk(*carry, keys[0])
        return jax.tree.map(lambda x: x[None], out)

    # check_vma=True (the default, stated explicitly): shard_map's
    # varying-manual-axes consistency check stays armed for EVERY mesh
    # program. Carries initialized with unvarying zeros inside the shard
    # (the LSTM summarizer's nn.scan) are promoted at their source with
    # jax.lax.pcast (modules.py:_LSTMNet) rather than by disabling the
    # check here. Runtime replication of pmean-driven state is additionally
    # assertable via online_learning(check_replication=True).
    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=True,
    )

    @jax.jit
    def run(astate, env_states, ep_ret, ep_aux, key):
        keys = jax.random.split(key, n_dev)
        return sharded(astate, env_states, ep_ret, ep_aux, keys)

    return run


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


def _assert_replicated_across_devices(agent_state) -> None:
    """Debug guard for the mesh driver (`check_replication=True`): every
    leaf of the stacked learner/safety state that is supposed to be
    replicated (everything except the per-env `explore_state`) must be
    bit-identical across the leading device axis. A learner that updates a
    leaf without `pmean` diverges here on the very first learn — the
    runtime counterpart of shard_map's compile-time vma check, which cannot
    see replication-by-convention."""
    from jax.tree_util import keystr, tree_flatten_with_path

    learner = agent_state.learner
    if hasattr(learner, "explore_state"):
        learner = learner.replace(explore_state=None)
    leaves, _ = tree_flatten_with_path(
        {"learner": learner, "safety": agent_state.safety}
    )
    bad = []
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.ndim == 0:
            continue
        if not (arr == arr[:1]).all():
            detail = ""
            if np.issubdtype(arr.dtype, np.floating):
                detail = f" (max spread {np.max(np.abs(arr - arr[:1])):.3e})"
            bad.append(keystr(path) + detail)
    if bad:
        raise ValueError(
            "replication check failed: the following learner/safety state "
            "leaves differ across mesh devices after the first dispatch — "
            "a state update is missing its pmean over the mesh axis: "
            + "; ".join(bad)
        )


def _fold_summary_rows(arr: np.ndarray) -> np.ndarray:
    """(n_dev, C, 6) per-device summary rows -> (C, 6) global rows.
    Sums fold additively; the recent-return statistic folds as the
    envs_fin-weighted mean of per-device recents."""
    w = arr[..., _S_ENVS_FIN]
    recent = (arr[..., _S_RECENT] * w).sum(axis=0) / np.maximum(w.sum(axis=0), 1.0)
    out = arr.sum(axis=0)
    out[..., _S_RECENT] = recent
    return out


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
    curve_capacity: int = 4096,
    mesh=None,
    mesh_axis: str = "data",
    deferred_push: Optional[bool] = None,
    check_replication: bool = False,
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
    to O(chunks_per_dispatch) floats. `stats="curves"` drains real
    per-episode returns from a bounded device-side ring (`curve_capacity`).

    `mesh=` scales the same driver data-parallel over a `jax.sharding.Mesh`
    (one axis, named `mesh_axis`): `num_envs` is the GLOBAL env count, split
    evenly across devices; the learner is replicated with gradient `pmean`;
    every stats/early-stop feature stays live. With `mesh`, a provided
    `agent_state` must be mesh-stacked (leading device axis) — e.g. from a
    previous mesh run or `parallel.reshard_agent_state`.

    `check_replication=True` (mesh only, debug): after the FIRST dispatch,
    every gradient-driven state leaf (learner + safety, excluding the
    per-env `explore_state`) is fetched and asserted bit-identical across
    devices — a learner that updates any leaf without `pmean` (the bug class
    round 3 found by hand in SAC's alpha and RC's lambda) fails loudly with
    the offending leaf path instead of silently diverging."""
    if stats not in _STATS_MODES:
        raise ValueError(f"stats must be one of {_STATS_MODES}, got {stats!r}")
    summary = stats == "summary"
    curves = stats == "curves"
    if deferred_push is None:
        deferred_push = False
    elif deferred_push and not agent.replay_buffer.supports_deferred_push:
        raise ValueError(
            f"{type(agent.replay_buffer).__name__} does not support deferred "
            "(chunk-granular) pushes"
        )
    orig_agent = agent
    agent = agent.for_env(env)
    n_dev = 1
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if num_envs % n_dev != 0:
            raise ValueError(
                f"num_envs={num_envs} must divide evenly over the "
                f"{n_dev}-device mesh"
            )
        agent = dataclasses.replace(
            agent,
            policy_learner=dataclasses.replace(
                agent.policy_learner, pmean_axis=mesh_axis
            ),
        )
        if hasattr(agent.safety_module, "pmean_axis"):
            agent = dataclasses.replace(
                agent,
                safety_module=dataclasses.replace(
                    agent.safety_module, pmean_axis=mesh_axis
                ),
            )
    envs_per_dev = num_envs // n_dev
    if curves and envs_per_dev > curve_capacity:
        warnings.warn(
            f"stats='curves' with envs_per_dev={envs_per_dev} > "
            f"curve_capacity={curve_capacity} (num_envs={num_envs} over "
            f"{n_dev} device(s)): if more than curve_capacity episodes "
            "finish in one step on one device, the colliding entries are "
            "dropped (counted in episodes_dropped). Raise curve_capacity to "
            "at least envs_per_dev to rule this out.",
            stacklevel=2,
        )
    min_pushes = getattr(agent.replay_buffer, "min_pushes_before_sample", 1)
    if learn and min_pushes > 1 and learning_starts == 0 and learn_every_k_steps < min_pushes:
        # e.g. VisualReplayBuffer(dedup_next=True) excludes the newest
        # resident push from sampling; learning off a 1-push buffer would
        # silently resample that push with a zeroed next frame.
        raise ValueError(
            f"{type(agent.replay_buffer).__name__} needs "
            f"{min_pushes} pushes before its first sample "
            f"(min_pushes_before_sample), but learning_starts=0 with "
            f"learn_every_k_steps={learn_every_k_steps} would learn after "
            f"{learn_every_k_steps}. Set learning_starts >= "
            f"{min_pushes} * num_envs or learn_every_k_steps >= {min_pushes}."
        )
    venv = VectorEnv(env, envs_per_dev)
    key = jax.random.PRNGKey(seed)
    key, k_env, k_agent = jax.random.split(key, 3)

    def _fresh_per_env_leaves(astate, obs):
        """Rebuild the per-env carries of a restored AgentState around the
        learned params (evaluating / resuming on fresh envs, possibly a
        different num_envs)."""
        summ = agent.policy_learner.history_summarizer
        rep, rep_dim, num_actions = agent._rep_dims(venv.observation_dim)
        carry = summ.init_carry(envs_per_dev, venv.observation_dim, rep_dim)
        carry = summ.observe(carry, obs, None)
        space = agent.policy_learner.action_space
        mask = jnp.ones((envs_per_dev, num_actions), bool) if num_actions else None
        from pearl_tpu.policy_learners.policy_learner import ActionChoice

        return astate.replace(
            history_carry=carry,
            available_mask=mask,
            last_action=ActionChoice(
                action=jnp.zeros((envs_per_dev, space.action_dim)),
                index=jnp.zeros((envs_per_dev,), jnp.int32),
            ),
        )

    if env_states is None:
        if mesh is None:
            env_states, obs = venv.reset(k_env)
            if agent_state is None:
                agent_state = agent.init(
                    k_agent, venv.observation_dim, envs_per_dev, obs
                )
            else:
                agent_state = _fresh_per_env_leaves(agent_state, obs)
        else:
            from jax.sharding import PartitionSpec as P

            restored = agent_state
            if restored is not None:
                # Decide stacked-vs-unstacked against an abstract template of
                # this agent's UNSTACKED learner state (eval_shape allocates
                # nothing), not by matching shape[0] == n_dev — a coincidental
                # leading dim must not be silently sliced into garbage
                # replicas (ADVICE r3).
                template = jax.eval_shape(
                    lambda k: agent.init(
                        k,
                        venv.observation_dim,
                        envs_per_dev,
                        jnp.zeros((envs_per_dev, venv.observation_dim)),
                    ),
                    jax.random.PRNGKey(0),
                )
                t_nd = [x.ndim for x in jax.tree.leaves(template.learner)]
                r_leaves = jax.tree.leaves(restored.learner)
                r_nd = [x.ndim for x in r_leaves]
                if r_nd == t_nd:
                    raise ValueError(
                        "agent_state is unstacked (leaf ranks match the "
                        "single-device template); stack it for the "
                        f"{n_dev}-device mesh with parallel.reshard_agent_state"
                    )
                if r_nd != [d + 1 for d in t_nd] or (
                    r_leaves and r_leaves[0].shape[0] != n_dev
                ):
                    lead = r_leaves[0].shape[0] if r_leaves else 0
                    raise ValueError(
                        f"agent_state leaves (lead dim {lead}) do not match a "
                        f"{n_dev}-device stacking of this agent's learner "
                        "state; use parallel.reshard_agent_state first"
                    )

                def init_shard(env_keys, restored):
                    env_states, obs = venv.reset(env_keys[0])
                    astate = _fresh_per_env_leaves(
                        jax.tree.map(lambda x: x[0], restored), obs
                    )
                    return jax.tree.map(lambda x: x[None], (astate, env_states))

                init_fn = jax.jit(
                    jax.shard_map(
                        init_shard,
                        mesh=mesh,
                        in_specs=(P(mesh_axis), P(mesh_axis)),
                        out_specs=P(mesh_axis),
                    )
                )
                env_keys = jax.random.split(k_env, n_dev)
                agent_state, env_states = init_fn(env_keys, restored)
            else:

                def init_shard(env_keys, shared_key):
                    env_states, obs = venv.reset(env_keys[0])
                    astate = agent.init(
                        shared_key, venv.observation_dim, envs_per_dev, obs
                    )
                    return jax.tree.map(lambda x: x[None], (astate, env_states))

                init_fn = jax.jit(
                    jax.shard_map(
                        init_shard,
                        mesh=mesh,
                        in_specs=(P(mesh_axis), P()),
                        out_specs=P(mesh_axis),
                    )
                )
                env_keys = jax.random.split(k_env, n_dev)
                agent_state, env_states = init_fn(env_keys, k_agent)

    def chunk_for(do_learn: bool):
        cache_key = (
            weakref.ref(orig_agent), env, num_envs, learn_every_k_steps,
            do_learn, exploit, chunks_per_dispatch, stats, curve_capacity,
            mesh, mesh_axis, deferred_push,
        )

        def build():
            raw = _make_chunk_fn(
                agent, venv, learn_every_k_steps, do_learn, exploit,
                chunks_per_dispatch, stats, curve_capacity, deferred_push,
            )
            if mesh is None:
                return jax.jit(raw)
            return _mesh_wrap(raw, mesh, mesh_axis)

        return _cached_program(cache_key, build)

    run_chunk = chunk_for(learn)
    warm_chunk = chunk_for(False) if learning_starts > 0 else None

    B = envs_per_dev
    ep_ret = jnp.zeros((B,))
    ep_aux = (jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)))
    if summary:
        ep_aux = ep_aux + (
            jnp.zeros((B,)),  # last finished-episode return per env
            jnp.zeros((B,), bool),  # env finished >= 1 episode
            jnp.zeros((4,)),  # cumulative [n_fin, sum_ret, sum_cost, sum_risky]
        )
    elif curves:
        ep_aux = ep_aux + (
            # (3, R) finished-episode ring: [return, cost, risky-ratio] rows.
            # Stat-major: R on the minor axis keeps the ring's TPU layout
            # pad-free (an (R, 3) ring lane-pads 3 -> 128, 42x; round-5
            # profile) and the host drain un-transposes for free.
            jnp.zeros((3, curve_capacity)),
            jnp.zeros((), jnp.int32),  # ring write index (mod R)
            jnp.zeros((), jnp.uint32),  # lifetime finished count (wraps)
        )
    if mesh is not None:
        ep_ret = jnp.broadcast_to(ep_ret, (n_dev,) + ep_ret.shape)
        ep_aux = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape), ep_aux
        )
    finished: list = []
    finished_costs: list = []
    finished_risky: list = []
    curve: list = []
    last_summary = np.zeros((6,))
    total = 0
    reached = False
    drained = [0] * n_dev  # curves mode: episodes drained so far, per device
    raw_prev = [0] * n_dev  # last uint32 device counter seen, per device
    cum = [0] * n_dev  # exact lifetime finished count (host Python int)
    dropped = 0

    def _drain_ring(counts, ring, dev):
        """Pull the episodes finished since the last drain out of one
        device's ring, received TRANSPOSED as (3, R) (see the run_chunk
        comment; un-transposing here is a free numpy view). Finish order
        preserved; oldest beyond the ring capacity are lost and tallied.
        The device counter is uint32 and may wrap; the host reconstructs
        the exact total from deltas mod 2^32."""
        nonlocal dropped
        ring = ring.T
        R = ring.shape[0]
        raw = int(counts[-1]) & 0xFFFFFFFF
        cum[dev] += (raw - raw_prev[dev]) & 0xFFFFFFFF
        raw_prev[dev] = raw
        end = cum[dev]
        new = end - drained[dev]
        if new <= 0:
            return
        lost = max(0, new - R)
        dropped += lost
        start = end - (new - lost)
        idx = np.arange(start, end) % R
        rows = ring[idx]
        finished.extend(rows[:, 0].tolist())
        finished_costs.extend(rows[:, 1].tolist())
        finished_risky.extend(rows[:, 2].tolist())
        drained[dev] = end

    def consume(stats_dev, steps_done):
        """Fetch one dispatch's stats and fold finished episodes in."""
        nonlocal reached, last_summary
        if curves:
            counts, ring = (np.asarray(x) for x in stats_dev)
            if mesh is None:
                _drain_ring(counts, ring, 0)
            else:
                for dev in range(n_dev):
                    _drain_ring(counts[dev], ring[dev], dev)
        elif summary:
            arr = np.asarray(stats_dev)
            if mesh is None:
                rows = arr.reshape(-1, 6)
            else:
                rows = _fold_summary_rows(arr.reshape(n_dev, -1, 6))
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
        else:
            arr = np.asarray(stats_dev)
            if mesh is not None:
                # (n_dev, 4, S, B') -> (4, S, n_dev*B'): same step-major
                # drain; env order within a step is device-blocked.
                arr = np.concatenate(list(arr), axis=-1)
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
    replication_checked = False
    while total < max_steps and not reached:
        key, k = jax.random.split(key)
        learning_now = not (warm_chunk is not None and total < learning_starts)
        chunk = run_chunk if learning_now else warm_chunk
        agent_state, env_states, ep_ret, ep_aux, stats_dev = chunk(
            agent_state, env_states, ep_ret, ep_aux, k
        )
        total += learn_every_k_steps * num_envs * chunks_per_dispatch
        if (
            check_replication
            and mesh is not None
            and learning_now
            and learn
            and not replication_checked
        ):
            _assert_replicated_across_devices(agent_state)
            replication_checked = True
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
        # curves: `drained` holds the cumulative device-side finished count
        # (dropped episodes included); full: every episode was fetched.
        total_episodes=sum(drained) if curves else len(finished),
        episodes_dropped=dropped,
    )
