"""PackedReplayBuffer: single-contiguous-write ring must be semantically
identical to the per-field BasicReplayBuffer (same bump-ring cursor math, same
uniform sampling), with exact dtype round-trips through the f32 packing."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.replay_buffers.packed import PackedReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch


def _batch(key, n=8, s=4, a=2):
    ks = jax.random.split(key, 3)
    return TransitionBatch(
        state=jax.random.normal(ks[0], (n, s)),
        action=jax.random.normal(ks[1], (n, a)),
        reward=jax.random.normal(ks[2], (n,)),
        next_state=jax.random.normal(ks[0], (n, s)) + 1.0,
        terminated=jnp.arange(n) % 3 == 0,
        truncated=jnp.arange(n) % 5 == 0,
        action_index=jnp.arange(n, dtype=jnp.int32) % a,
    )


def test_packed_matches_basic_exactly():
    packed, basic = PackedReplayBuffer(capacity=64), BasicReplayBuffer(capacity=64)
    ex = _batch(jax.random.PRNGKey(0))
    ps, bs = packed.init(ex), basic.init(ex)

    for i in range(12):  # wraps the 64-slot ring with 8-row pushes
        b = _batch(jax.random.PRNGKey(i + 1))
        ps, bs = packed.push(ps, b), basic.push(bs, b)
        assert int(ps.cursor) == int(bs.cursor)
        assert int(ps.size) == int(bs.size)

    k = jax.random.PRNGKey(99)
    out_p, out_b = packed.sample(ps, k, 32), basic.sample(bs, k, 32)
    # Same size + same key => identical row indices => identical batches.
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        out_p,
        out_b,
    )
    assert out_p.terminated.dtype == jnp.bool_
    assert out_p.action_index.dtype == jnp.int32


def test_packed_end_to_end_dqn():
    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.envs import CartPole
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.training import online_learning

    agent = PearlAgent(
        policy_learner=DeepQLearning(training_rounds=1, batch_size=64),
        replay_buffer=PackedReplayBuffer(capacity=4096),
    )
    res = online_learning(
        agent, CartPole(), num_envs=16, max_steps=4096,
        learn_every_k_steps=8, seed=0,
    )
    assert res.total_steps == 4096
    assert np.isfinite(res.episode_returns).all()


def test_packed_rejects_bf16_and_wide_ints():
    """ADVICE r2: bf16_storage and 64-bit integer fields are silently
    unsupported by the f32 ring -> fail loudly at init."""
    import jax.numpy as jnp
    import pytest

    from pearl_tpu.replay_buffers.packed import PackedReplayBuffer
    from pearl_tpu.replay_buffers.transition import TransitionBatch

    example = TransitionBatch(
        state=jnp.zeros((1, 4)),
        action=jnp.zeros((1, 1)),
        reward=jnp.zeros((1,)),
        next_state=jnp.zeros((1, 4)),
        terminated=jnp.zeros((1,), bool),
        truncated=jnp.zeros((1,), bool),
        action_index=jnp.zeros((1,), jnp.int32),
    )
    with pytest.raises(ValueError, match="bf16"):
        PackedReplayBuffer(capacity=8, bf16_storage=True).init(example)
    # (The 64-bit-integer guard can't be exercised here: without
    # jax_enable_x64 an int64 leaf silently becomes int32 at construction,
    # which the f32 ring stores exactly for the small-range index fields.)
