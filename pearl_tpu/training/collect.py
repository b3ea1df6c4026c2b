"""Offline-data collection (reference:
pearl/utils/functional_utils/experimentation/create_offline_data.py:21-210).

Rolls out a (possibly pretrained) agent and returns/saves its transitions as
a columnar dataset for offline RL training."""

from __future__ import annotations

from typing import Optional

import jax

from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.training.offline import save_offline_data
from pearl_tpu.training.online import online_learning


def collect_offline_data(
    agent: PearlAgent,
    env,
    *,
    num_transitions: int,
    num_envs: int = 16,
    seed: int = 0,
    learner_state=None,
    exploit: bool = False,
    save_path: Optional[str] = None,
) -> TransitionBatch:
    """Run the agent (no learning) until `num_transitions` transitions have
    been gathered; returns them as one TransitionBatch (and optionally saves
    a .npz). Pass a trained `learner_state` (with exploit=True) to collect
    from a learned policy; per-env exploration counters are re-initialized."""
    capacity = num_transitions
    collector = PearlAgent(
        policy_learner=agent.policy_learner,
        replay_buffer=BasicReplayBuffer(capacity=capacity),
        safety_module=agent.safety_module,
        track_available_masks=agent.track_available_masks,
        store_cost=agent.store_cost,
    ).for_env(env)
    astate = None
    if learner_state is not None:
        import jax as _jax

        from pearl_tpu.envs.vector import VectorEnv

        venv = VectorEnv(env, num_envs)
        k = _jax.random.PRNGKey(seed + 1)
        _, obs = venv.reset(k)
        astate = collector.init(k, venv.observation_dim, num_envs, obs)
        fresh_explore = collector.policy_learner.init(
            k, venv.observation_dim, env.action_space, num_envs
        ).explore_state
        astate = astate.replace(
            learner=learner_state.replace(explore_state=fresh_explore)
        )
    res = online_learning(
        collector,
        env,
        num_envs=num_envs,
        max_steps=num_transitions,
        learn_every_k_steps=8,
        learn=False,
        exploit=exploit,
        seed=seed,
        agent_state=astate,
        env_states=None,
    )
    replay = res.agent_state.replay
    n = int(replay.size)
    batch = jax.tree.map(
        lambda x: x[:n] if x is not None else None, replay.storage
    )
    if save_path:
        save_offline_data(save_path, batch)
    return batch
