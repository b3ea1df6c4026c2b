import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch


def make_batch(n, offset=0.0):
    return TransitionBatch(
        state=jnp.arange(n, dtype=jnp.float32)[:, None] + offset,
        action=jnp.zeros((n, 1)),
        reward=jnp.arange(n, dtype=jnp.float32) + offset,
        next_state=jnp.zeros((n, 1)),
        terminated=jnp.zeros((n,), jnp.bool_),
        truncated=jnp.zeros((n,), jnp.bool_),
        action_index=jnp.zeros((n,), jnp.int32),
    )


def test_push_and_size():
    buf = BasicReplayBuffer(capacity=8)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(3))
    assert int(state.size) == 3
    assert int(state.cursor) == 3
    state = buf.push(state, make_batch(4))
    assert int(state.size) == 7


def test_ring_wraparound():
    buf = BasicReplayBuffer(capacity=4)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(3, offset=0.0))
    state = buf.push(state, make_batch(3, offset=10.0))
    assert int(state.size) == 4
    assert int(state.cursor) == 2
    # Slots 3, 0, 1 hold the new transitions (10, 11, 12), slot 2 the old (2).
    rewards = np.asarray(state.storage.reward)
    assert rewards[3] == 10.0 and rewards[0] == 11.0 and rewards[1] == 12.0
    assert rewards[2] == 2.0


def test_sample_only_valid_entries():
    buf = BasicReplayBuffer(capacity=100)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(5, offset=1.0))  # rewards 1..5
    batch = buf.sample(state, jax.random.PRNGKey(0), 64)
    assert batch.reward.shape == (64,)
    assert np.all(np.asarray(batch.reward) >= 1.0)
    assert np.all(np.asarray(batch.reward) <= 5.0)


def test_clear():
    buf = BasicReplayBuffer(capacity=8)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(3))
    state = buf.clear(state)
    assert int(state.size) == 0 and int(state.cursor) == 0


def test_push_inside_jit():
    buf = BasicReplayBuffer(capacity=16)
    state = buf.init(make_batch(1))

    @jax.jit
    def push(s, b):
        return buf.push(s, b)

    state = push(state, make_batch(4))
    assert int(state.size) == 4


def test_bf16_storage_roundtrip():
    buf = BasicReplayBuffer(capacity=16, bf16_storage=True)
    state = buf.init(make_batch(1))
    assert state.storage.state.dtype == jnp.bfloat16
    assert state.storage.action_index.dtype == jnp.int32  # ints untouched
    state = buf.push(state, make_batch(4, offset=1.0))
    batch = buf.sample(state, jax.random.PRNGKey(0), 8)
    assert batch.reward.dtype == jnp.float32  # converted back on sample
    # bf16 has ~3 decimal digits; small integers are exact.
    assert set(np.asarray(batch.reward).tolist()).issubset({1.0, 2.0, 3.0, 4.0})
