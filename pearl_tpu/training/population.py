"""Population training: a whole seed/hyperparameter sweep as ONE compiled
XLA program, `vmap`ped over a member axis.

The reference runs sweeps as one OS process per (method, run)
(pearl/utils/scripts/benchmark.py:75-118, torch.multiprocessing) — four
seeds means four interpreters, four env copies, four GPU contexts. Because
every pearl_tpu component is a pure function over pytrees, the same sweep
vectorizes instead: stack M members' AgentStates/env-states on a leading
axis and `jax.vmap` the online-learning chunk over it. One trace, one
executable, M training runs advancing in lockstep on one chip — the
members share every compiled kernel, so a 4-seed CartPole sweep costs
roughly one run's wall-clock plus 4x the (tiny) model/replay memory.

Hyperparameter sweeps ride the same axis when the hyperparameter lives in
*state* rather than in Python config: anything reachable as a pytree leaf of
the learner state can differ per member (`member_state_transform`), e.g.
SAC's actor learning rate (optax.inject_hyperparams keeps it in the
optimizer state — sac.py) or an exploration epsilon carried in state.
Python-config hyperparameters (layer sizes, training_rounds) change the
traced program and therefore cannot share one vmap — run those as separate
populations.

Statistics are summary-mode only (the production mode of
`training/online.py`): episode accounting stays on device per member and the
host fetches a (M, 6) summary per chunk.
"""

from __future__ import annotations

import dataclasses
import weakref
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent
from pearl_tpu.envs.vector import VectorEnv
from pearl_tpu.training.online import (
    _S_ENVS_FIN,
    _S_RECENT,
    _S_SUM_RET,
    _S_TOTAL_FIN,
    _cached_program,
    _make_chunk_fn,
)


@dataclasses.dataclass
class PopulationResult:
    num_members: int
    total_steps: int  # env steps per member
    agent_states: AgentState  # stacked on a leading (M, ...) axis
    env_states: object  # stacked on a leading (M, ...) axis
    # (dispatches, M) trace of the recent-return statistic per member — the
    # sweep's learning curves, one fetch per dispatch.
    return_curves: np.ndarray
    mean_returns: np.ndarray  # (M,) mean finished-episode return per member
    total_episodes: np.ndarray  # (M,) finished episodes per member
    recent_returns: np.ndarray  # (M,) last recent-return statistic per member
    reached_target: bool = False

    def member_state(self, i: int) -> AgentState:
        """Unstack member i's AgentState (e.g. to checkpoint the best seed)."""
        return jax.tree.map(lambda x: x[i], self.agent_states)


def _key_name(k):
    return getattr(k, "name", None) or getattr(k, "key", None)


def _is_shared_ring_leaf(path) -> bool:
    """True for the replay ring's cursor/size leaves inside an AgentState."""
    names = [_key_name(k) for k in path]
    return bool(names) and names[0] == "replay" and names[-1] in ("cursor", "size")


def _member_axes(stacked_state, share_cursor: bool):
    """vmap axis spec for an AgentState: every leaf batched on axis 0, except
    (when share_cursor) the replay ring's cursor/size, which stay UNBATCHED.

    Why: the ring cursor advances by a static amount per push (replay_buffer
    .py push: start/cursor'/size' depend only on cursor and the static batch
    size), so every member's cursor is identical at every step. Keeping it
    unbatched means the vmapped storage write stays ONE contiguous
    dynamic_update_slice over the (M, capacity, ...) array instead of a
    per-member scatter — XLA:TPU serializes general scatters row-by-row
    (docs/ROADMAP.md), which costs ~4x aggregate throughput at bench scale."""
    import jax.tree_util as jtu

    return jtu.tree_map_with_path(
        lambda p, _: None if (share_cursor and _is_shared_ring_leaf(p)) else 0,
        stacked_state,
    )


def population_learning(
    agent: PearlAgent,
    env,
    *,
    num_members: int = 4,
    num_envs: int = 16,
    max_steps: int = 100_000,
    learn_every_k_steps: int = 1,
    chunks_per_dispatch: int = 1,
    learning_starts: int = 0,
    seeds: Optional[Sequence[int]] = None,
    seed: int = 0,
    target_return: Optional[float] = None,
    target_window: int = 20,
    exploit: bool = False,
    member_state_transform: Optional[Callable[[jnp.ndarray, AgentState], AgentState]] = None,
    shared_ring_cursor: Optional[bool] = None,
    verbose: bool = False,
) -> PopulationResult:
    """Train `num_members` independent agents simultaneously in one program.

    Each member m runs the exact `online_learning` chunk pipeline with its own
    RNG stream `PRNGKey(seeds[m])` (default `seed + m`), its own `num_envs`
    vectorized env instances, replay ring, and learner state; `max_steps`
    counts env steps *per member*. With `target_return` set, training stops
    when EVERY member's recent-return statistic reaches the target (the
    all-seeds-converge criterion the multi-seed parity protocol uses).

    `member_state_transform(member_indices, stacked_learner_state)` edits the
    freshly initialized stacked states to sweep state-resident
    hyperparameters — it receives the (M,) member-index array and the stacked
    AgentState and must return the edited stacked AgentState.

    `shared_ring_cursor` keeps the replay ring's cursor/size UNBATCHED under
    the member vmap (see `_member_axes`): the push stays one contiguous
    dynamic_update_slice instead of a per-member scatter, which on TPU is the
    difference between ~0.25x and ~1x of solo throughput at bench scale.
    Default (None) auto-enables for BasicReplayBuffer / PrioritizedReplayBuffer
    (whose cursor dynamics are provably data-independent); pass True/False to
    override.
    """
    if seeds is None:
        seeds = [seed + m for m in range(num_members)]
    if len(seeds) != num_members:
        raise ValueError(f"len(seeds)={len(seeds)} != num_members={num_members}")
    bound = agent.for_env(env)
    venv = VectorEnv(env, num_envs)

    member_keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

    def init_one(key):
        # Mirrors online_learning's key discipline (online.py:226-231) so a
        # population member is run-for-run comparable with a solo run at the
        # same seed.
        key, k_env, k_agent = jax.random.split(key, 3)
        env_states, obs = venv.reset(k_env)
        astate = bound.init(k_agent, venv.observation_dim, num_envs, obs)
        return key, astate, env_states

    keys, agent_states, env_states = jax.vmap(init_one)(member_keys)
    if member_state_transform is not None:
        agent_states = member_state_transform(
            jnp.arange(num_members), agent_states
        )

    if shared_ring_cursor is None:
        from pearl_tpu.replay_buffers.prioritized import PrioritizedReplayBuffer
        from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer

        shared_ring_cursor = type(agent.replay_buffer) in (
            BasicReplayBuffer,
            PrioritizedReplayBuffer,
        )
    state_axes = _member_axes(agent_states, shared_ring_cursor)
    if shared_ring_cursor:
        # Collapse the (identical) stacked cursor/size back to scalars so the
        # unbatched axis spec matches the carried arrays.
        import jax.tree_util as jtu

        agent_states = jtu.tree_map_with_path(
            lambda p, x: x[0] if _is_shared_ring_leaf(p) else x, agent_states
        )

    def vmapped_chunk(do_learn: bool):
        cache_key = (
            weakref.ref(agent), "pop", env, num_members, num_envs,
            learn_every_k_steps, do_learn, exploit, chunks_per_dispatch,
            shared_ring_cursor,
        )
        return _cached_program(
            cache_key,
            lambda: jax.jit(
                jax.vmap(
                    _make_chunk_fn(
                        bound, venv, learn_every_k_steps, do_learn, exploit,
                        chunks_per_dispatch, "summary",
                    ),
                    in_axes=(state_axes, 0, 0, 0, 0),
                    out_axes=(state_axes, 0, 0, 0, 0),
                )
            ),
        )

    pop_run = vmapped_chunk(True)
    pop_warm = vmapped_chunk(False) if learning_starts > 0 else None

    @jax.jit
    def step_keys(keys):
        nxt, use = jax.vmap(lambda k: tuple(jax.random.split(k)))(keys)
        return nxt, use

    ep_ret = jnp.zeros((num_members, num_envs))
    ep_aux = (
        jnp.zeros((num_members, num_envs)),
        jnp.zeros((num_members, num_envs)),
        jnp.zeros((num_members, num_envs)),
        jnp.zeros((num_members, num_envs)),
        jnp.zeros((num_members, num_envs), bool),
        jnp.zeros((num_members, 4)),
    )

    curves: list = []
    last_summary = np.zeros((num_members, 6))
    total = 0
    reached = False

    def consume(stats_dev, steps_done):
        nonlocal reached, last_summary
        arr = np.asarray(stats_dev)  # (M, 6) or (M, C, 6)
        rows = arr.reshape(num_members, -1, 6)
        curves.extend(np.moveaxis(rows[:, :, _S_RECENT], 0, 1).tolist())
        last_summary = rows[:, -1]
        if verbose:
            rec = ", ".join(f"{v:.1f}" for v in last_summary[:, _S_RECENT])
            print(f"steps/member={steps_done} recent_returns=[{rec}]")
        if target_return is not None:
            ok = (
                (rows[:, :, _S_TOTAL_FIN] >= target_window)
                & (rows[:, :, _S_ENVS_FIN] >= min(target_window, num_envs))
                & (rows[:, :, _S_RECENT] >= target_return)
            )
            # all members at target within the same dispatch row
            if ok.all(axis=0).any():
                reached = True

    pending = None
    while total < max_steps and not reached:
        keys, use = step_keys(keys)
        chunk = pop_warm if (pop_warm is not None and total < learning_starts) else pop_run
        agent_states, env_states, ep_ret, ep_aux, stats_dev = chunk(
            agent_states, env_states, ep_ret, ep_aux, use
        )
        total += learn_every_k_steps * num_envs * chunks_per_dispatch
        if pending is not None:
            consume(*pending)
        pending = (stats_dev, total)
    if pending is not None:
        consume(*pending)

    if shared_ring_cursor:
        # Re-broadcast the shared cursor/size so member_state(i)'s uniform
        # x[i] unstacking works on every leaf.
        agent_states = jax.tree_util.tree_map_with_path(
            lambda p, x: (
                jnp.broadcast_to(x, (num_members,) + x.shape)
                if _is_shared_ring_leaf(p)
                else x
            ),
            agent_states,
        )
    n_ep = last_summary[:, _S_TOTAL_FIN]
    return PopulationResult(
        num_members=num_members,
        total_steps=total,
        agent_states=agent_states,
        env_states=env_states,
        return_curves=np.asarray(curves),
        mean_returns=last_summary[:, _S_SUM_RET] / np.maximum(n_ep, 1.0),
        total_episodes=n_ep.astype(np.int64),
        recent_returns=last_summary[:, _S_RECENT],
        reached_target=reached,
    )
