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


def test_ring_wraparound_divisible():
    """capacity % N == 0 (every production config): exact FIFO ring."""
    buf = BasicReplayBuffer(capacity=4)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(2, offset=0.0))  # slots 0,1 <- 0,1
    state = buf.push(state, make_batch(2, offset=10.0))  # slots 2,3 <- 10,11
    state = buf.push(state, make_batch(2, offset=20.0))  # wraps: 0,1 <- 20,21
    assert int(state.size) == 4
    assert int(state.cursor) == 2
    rewards = np.asarray(state.storage.reward)
    assert rewards[0] == 20.0 and rewards[1] == 21.0
    assert rewards[2] == 10.0 and rewards[3] == 11.0


def test_ring_wraparound_non_divisible_restarts_at_zero():
    """Bump-ring contract: a batch that does not fit before the ring end is
    written from slot 0 instead of wrapping mid-batch; `size` is a high-water
    mark so never-written tail slots are never sampled."""
    buf = BasicReplayBuffer(capacity=4)
    state = buf.init(make_batch(1))
    state = buf.push(state, make_batch(3, offset=0.0))  # slots 0..2 <- 0,1,2
    state = buf.push(state, make_batch(3, offset=10.0))  # restart: 0..2 <- 10..12
    assert int(state.size) == 3  # slot 3 was never written
    assert int(state.cursor) == 3
    rewards = np.asarray(state.storage.reward)
    assert rewards[0] == 10.0 and rewards[1] == 11.0 and rewards[2] == 12.0
    batch = buf.sample(state, jax.random.PRNGKey(0), 64)
    assert np.all(np.asarray(batch.reward) >= 10.0)  # slot 3 never sampled


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
