"""VisualReplayBuffer (frame-dedup ring): sampled batches must be BIT-EQUAL
to BasicReplayBuffer's on the same pipeline and RNG stream — the stacks
reconstructed from single-frame rows + done-chain masks must match the
stacking summarizer's zero-padded windows exactly — and DQN learning through
it must be identical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import SyntheticAtari
from pearl_tpu.history_summarization_modules import StackingHistorySummarization
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.visual import VisualReplayBuffer
from pearl_tpu.training import online_learning

H = W = 8
STACK = 3
NUM_ENVS = 4


def _agent(buffer):
    return PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(H, W, STACK),
                out_channels=(8, 8),
                kernel_sizes=(3, 3),
                strides=(2, 1),
                paddings=(1, 1),
                hidden_dims=(32,),
                time_major_stack=True,
            ),
            training_rounds=1,
            batch_size=16,
            history_summarizer=StackingHistorySummarization(
                history_length=STACK, include_action=False
            ),
        ),
        replay_buffer=buffer,
    )


def _env():
    # Single-frame observations; short episodes so done-chain masking is
    # exercised constantly.
    return SyntheticAtari(height=H, width=W, frames=1, episode_len=5)


def test_visual_buffer_samples_bit_equal_to_basic():
    # Capacity > total rows: no ring wrap, where the visual buffer's
    # restricted sampling is the identity mapping (see sample()).
    kwargs = dict(
        num_envs=NUM_ENVS, max_steps=NUM_ENVS * 64, learn_every_k_steps=4,
        seed=3,
    )
    basic = online_learning(_agent(BasicReplayBuffer(capacity=512)), _env(), **kwargs)
    visual = online_learning(
        _agent(VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS)),
        _env(),
        **kwargs,
    )
    # Same RNG stream -> same episodes...
    np.testing.assert_array_equal(basic.episode_returns, visual.episode_returns)
    # ...and bit-identical learner params: every sampled batch (state AND
    # reconstructed next_state stacks, incl. zero-padded episode starts)
    # matched, so every gradient step matched.
    for x, y in zip(
        jax.tree.leaves(basic.agent_state.learner.params),
        jax.tree.leaves(visual.agent_state.learner.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # Direct batch-level check on the final buffers: same sample key ->
    # bit-equal TransitionBatch.
    bb, vb = basic.agent_state.replay, visual.agent_state.replay
    k = jax.random.PRNGKey(9)
    sb = BasicReplayBuffer(capacity=512).sample(bb, k, 32)
    sv = VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS).sample(
        vb, k, 32
    )
    for name in ("state", "next_state", "reward", "action_index", "terminated"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sb, name)), np.asarray(getattr(sv, name))
        )


def test_visual_buffer_storage_is_deduped():
    buf = VisualReplayBuffer(capacity=128, stack=STACK, num_envs=NUM_ENVS)
    agent = _agent(buf)
    res = online_learning(
        agent, _env(), num_envs=NUM_ENVS, max_steps=NUM_ENVS * 16,
        learn_every_k_steps=4, seed=0,
    )
    st = res.agent_state.replay.storage
    F = H * W
    assert st["frame_s"].shape == (128, F)  # 2 frames/row, not 2*stack
    assert st["frame_n"].shape == (128, F)
    assert int(res.agent_state.replay.push_count) == 16


def test_visual_buffer_bf16_frames_roundtrip():
    buf = VisualReplayBuffer(
        capacity=64, stack=STACK, num_envs=NUM_ENVS, frame_dtype=jnp.bfloat16
    )
    agent = _agent(buf)
    res = online_learning(
        agent, _env(), num_envs=NUM_ENVS, max_steps=NUM_ENVS * 8,
        learn_every_k_steps=4, seed=0,
    )
    st = res.agent_state.replay.storage
    assert st["frame_s"].dtype == jnp.bfloat16
    batch = buf.sample(res.agent_state.replay, jax.random.PRNGKey(0), 8)
    assert batch.state.dtype == jnp.float32
    assert np.isfinite(np.asarray(batch.state)).all()


def test_visual_buffer_validation_errors():
    from pearl_tpu.replay_buffers.transition import TransitionBatch

    good_ex = TransitionBatch(
        state=jnp.zeros((1, H * W * STACK)),
        action=jnp.zeros((1, 1)),
        reward=jnp.zeros((1,)),
        next_state=jnp.zeros((1, H * W * STACK)),
        terminated=jnp.zeros((1,), bool),
        truncated=jnp.zeros((1,), bool),
        action_index=jnp.zeros((1,), jnp.int32),
    )
    with pytest.raises(ValueError, match="multiple"):
        VisualReplayBuffer(capacity=102, stack=STACK, num_envs=NUM_ENVS).init(
            good_ex
        )
    ok = VisualReplayBuffer(capacity=128, stack=STACK, num_envs=NUM_ENVS)
    # Pushes must be exactly num_envs rows.
    state = ok.init(good_ex)
    with pytest.raises(ValueError, match="num_envs"):
        ok.push(state, jax.tree.map(lambda x: jnp.repeat(x, 8, axis=0), good_ex))

    ex = TransitionBatch(
        state=jnp.zeros((1, H * W * STACK + 1)),
        action=jnp.zeros((1, 1)),
        reward=jnp.zeros((1,)),
        next_state=jnp.zeros((1, H * W * STACK + 1)),
        terminated=jnp.zeros((1,), bool),
        truncated=jnp.zeros((1,), bool),
        action_index=jnp.zeros((1,), jnp.int32),
    )
    with pytest.raises(ValueError, match="stack"):
        ok.init(ex)
    assert not ok.supports_deferred_push


def test_visual_buffer_wrap_excludes_stale_history():
    """After the ring wraps, rows whose backward neighbors were overwritten
    must never be sampled; every sampled state stack is [p-2, p-1, p] of
    consecutive push values."""
    B, T, CAP = 2, 3, 8  # cap_pushes = 4
    from pearl_tpu.replay_buffers.transition import TransitionBatch

    buf = VisualReplayBuffer(capacity=CAP, stack=T, num_envs=B)
    F = 4

    def push_batch(p):
        frame = jnp.full((B, F), float(p))
        stack = jnp.concatenate([frame] * T, axis=-1)  # only last F is stored
        return TransitionBatch(
            state=stack, action=jnp.zeros((B, 1)), reward=jnp.zeros((B,)),
            next_state=stack, terminated=jnp.zeros((B,), bool),
            truncated=jnp.zeros((B,), bool),
            action_index=jnp.zeros((B,), jnp.int32),
        )

    state = buf.init(jax.tree.map(lambda x: x[:1], push_batch(0)))
    for p in range(6):  # wraps: pushes 0,1 overwritten by 4,5
        state = buf.push(state, push_batch(p))
    batch = buf.sample(state, jax.random.PRNGKey(0), 64)
    stacks = np.asarray(batch.state).reshape(64, T, F)[:, :, 0]  # frame values
    for row in stacks:
        p = row[-1]
        assert p in (4.0, 5.0), row  # only fully-reconstructible pushes
        np.testing.assert_array_equal(row, [p - 2, p - 1, p])


def test_visual_pipeline_on_breakout_multichannel_frames():
    """The frame-dedup pipeline on a REAL game env with MULTI-channel frames:
    Breakout's (10, 10, 4) feature frames, stack 4 -> CNN input (10, 10, 16).
    Bit-equal to BasicReplayBuffer on the same RNG stream, and the learner
    trains finitely."""
    from pearl_tpu.envs import Breakout

    T = 4
    def agent(buffer):
        return PearlAgent(
            policy_learner=DeepQLearning(
                q_network=CNNQValueNetwork(
                    input_shape=(10, 10, 4 * T),
                    out_channels=(16, 32),
                    kernel_sizes=(3, 3),
                    strides=(2, 1),
                    paddings=(1, 1),
                    hidden_dims=(32,),
                    time_major_stack=True,
                    frame_channels=4,
                ),
                training_rounds=1,
                batch_size=16,
                history_summarizer=StackingHistorySummarization(
                    history_length=T, include_action=False
                ),
            ),
            replay_buffer=buffer,
        )

    kwargs = dict(
        num_envs=NUM_ENVS, max_steps=NUM_ENVS * 48, learn_every_k_steps=4,
        seed=1,
    )
    basic = online_learning(agent(BasicReplayBuffer(capacity=512)), Breakout(), **kwargs)
    visual = online_learning(
        agent(VisualReplayBuffer(capacity=512, stack=T, num_envs=NUM_ENVS)),
        Breakout(),
        **kwargs,
    )
    np.testing.assert_array_equal(basic.episode_returns, visual.episode_returns)
    for x, y in zip(
        jax.tree.leaves(basic.agent_state.learner.params),
        jax.tree.leaves(visual.agent_state.learner.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # Dedup really happened: a row stores ONE 400-float frame pair, not
    # 2 x 4-frame stacks.
    st = visual.agent_state.replay.storage
    assert st["frame_s"].shape == (512, 400)
