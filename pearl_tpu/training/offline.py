"""Offline learning & evaluation (reference:
pearl/utils/functional_utils/train_and_eval/offline_learning_and_evaluation.py:40-267
and experimentation/create_offline_data.py:21-210).

The reference torch.loads a list of transition dicts and pushes them one by
one into a CPU replay buffer, then runs N x {sample -> learn_batch}. Here the
dataset is columnar arrays loaded straight into the HBM ring buffer in one
scatter, and the training loop is a chunked jitted scan.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.training.online import online_learning

# Signature: logger(metrics_dict, batch_index) (reference LearningLogger,
# learning_logger.py:10-40).
LearningLogger = Callable[[Dict[str, np.ndarray], int], None]


def transitions_from_arrays(
    *,
    state,
    action,
    reward,
    next_state,
    terminated,
    truncated=None,
    action_index=None,
    **optional,
) -> TransitionBatch:
    """Build a TransitionBatch from columnar numpy/JAX arrays."""
    n = np.asarray(reward).shape[0]
    if truncated is None:
        truncated = np.zeros((n,), bool)
    if action_index is None:
        action_index = np.asarray(action)[:, 0].astype(np.int32)
    return TransitionBatch(
        state=jnp.asarray(state, jnp.float32),
        action=jnp.asarray(action, jnp.float32),
        reward=jnp.asarray(reward, jnp.float32),
        next_state=jnp.asarray(next_state, jnp.float32),
        terminated=jnp.asarray(terminated, bool),
        truncated=jnp.asarray(truncated, bool),
        action_index=jnp.asarray(action_index, jnp.int32),
        **{k: jnp.asarray(v) for k, v in optional.items()},
    )


def _batch_from_reference_pt(path: str) -> TransitionBatch:
    """Read the reference's hosted-dataset format: a torch-saved iterable of
    transition dicts with keys (observation, action, reward,
    next_observation, curr_available_actions, next_available_actions,
    terminated, truncated) — offline_learning_and_evaluation.py:40-138."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    rows = list(data)

    def col(key, default=None):
        if key not in rows[0]:
            return default
        return np.stack([np.atleast_1d(np.asarray(r[key])) for r in rows])

    action = col("action")
    return transitions_from_arrays(
        state=col("observation"),
        action=action,
        reward=col("reward").reshape(len(rows)),
        next_state=col("next_observation"),
        terminated=col(
            "terminated", np.ones((len(rows), 1), bool)
        ).reshape(len(rows)),
        truncated=col("truncated", np.zeros((len(rows), 1), bool)).reshape(
            len(rows)
        ),
    )


def get_offline_data_in_buffer(
    path: str, buffer: Optional[BasicReplayBuffer] = None
):
    """Load an offline dataset into a replay buffer (reference
    offline_learning_and_evaluation.py:40-138). Accepts either this
    framework's columnar .npz or the reference's .pt list-of-dicts format
    (so datasets produced for/by the reference drop straight in), from a
    local path or a URL (http(s)/file, like the reference's hosted
    datasets — URLs are fetched to a temp file first)."""
    tmp_path = None
    if "://" in path:
        import tempfile
        import urllib.error
        import urllib.parse
        import urllib.request

        # Detect format from the URL *path* (a presigned ?query must not
        # defeat the .pt suffix check).
        url_path = urllib.parse.urlparse(path).path
        suffix = ".pt" if url_path.endswith(".pt") else ".npz"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as tmp:
            try:
                with urllib.request.urlopen(path) as resp:
                    tmp.write(resp.read())
            except (urllib.error.URLError, OSError) as e:
                raise RuntimeError(
                    f"could not fetch offline dataset {path!r}: {e}. If this "
                    "environment has no network egress, download the file "
                    "elsewhere and pass its local path (or a file:// URL)."
                ) from e
            path = tmp_path = tmp.name
    try:
        if path.endswith(".pt"):
            batch = _batch_from_reference_pt(path)
        else:
            data = np.load(path)
            batch = transitions_from_arrays(**{k: data[k] for k in data.files})
    finally:
        if tmp_path is not None:
            import os

            os.unlink(tmp_path)
    n = batch.reward.shape[0]
    if buffer is None:
        buffer = BasicReplayBuffer(capacity=n)
    example = jax.tree.map(lambda x: x[:1] if x is not None else None, batch)
    state = buffer.init(example)
    state = buffer.push(state, batch)
    return buffer, state


def save_offline_data(path: str, batch: TransitionBatch) -> None:
    """Dump a TransitionBatch as columnar .npz (create_offline_data parity)."""
    arrays = {
        k: np.asarray(v)
        for k, v in vars(batch).items()
        if v is not None and not k.startswith("_")
    }
    np.savez(path, **arrays)


def offline_learning(
    agent: PearlAgent,
    agent_state: AgentState,
    buffer: BasicReplayBuffer,
    buffer_state,
    *,
    number_of_batches: int = 1000,
    batch_size: int = 128,
    seed: int = 0,
    logger: Optional[LearningLogger] = None,
    log_every: int = 100,
) -> AgentState:
    """N x {uniform sample -> agent.learn_batch} (reference :141-226)."""

    @jax.jit
    def chunk(astate, key):
        def body(astate, k):
            batch = buffer.sample(buffer_state, k, batch_size)
            astate, metrics = agent.learn_batch(astate, batch)
            return astate, metrics

        keys = jax.random.split(key, log_every)
        return jax.lax.scan(body, astate, keys)

    key = jax.random.PRNGKey(seed)
    done = 0
    while done < number_of_batches:
        key, k = jax.random.split(key)
        agent_state, metrics = chunk(agent_state, k)
        done += log_every
        if logger is not None:
            logger(jax.tree.map(lambda x: np.asarray(x).mean(), metrics), done)
    return agent_state


def offline_evaluation(
    agent: PearlAgent,
    agent_state: AgentState,
    env,
    *,
    num_envs: int = 16,
    max_steps: int = 20_000,
    seed: int = 1,
):
    """Greedy evaluation episodes, no learning (reference :229-267). Returns
    the array of finished-episode returns."""
    res = online_learning(
        agent,
        env,
        num_envs=num_envs,
        max_steps=max_steps,
        learn_every_k_steps=8,
        exploit=True,
        learn=False,
        seed=seed,
        agent_state=agent_state,
    )
    return res.episode_returns
