"""Frame-ring visual fast path (FrameRingHistorySummarization +
VisualReplayBuffer.push_frames + CNN ring consumption): must be BIT-EQUAL to
the shifting StackingHistorySummarization pipeline on the same RNG stream —
same episodes, same pushes, same sampled batches, bit-identical trained
params — while doing O(frame) instead of O(window) work per step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import SyntheticAtari
from pearl_tpu.history_summarization_modules import (
    FrameRingHistorySummarization,
    FrameRingView,
    StackingHistorySummarization,
)
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.replay_buffers.visual import VisualReplayBuffer
from pearl_tpu.training import online_learning

H = W = 8
STACK = 3
NUM_ENVS = 4


def _agent(buffer, summ, frame_channels=1, hw=(H, W)):
    h, w = hw
    return PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(h, w, STACK * frame_channels),
                out_channels=(8, 8),
                kernel_sizes=(3, 3),
                strides=(2, 1),
                paddings=(1, 1),
                hidden_dims=(32,),
                time_major_stack=True,
                frame_channels=frame_channels,
            ),
            training_rounds=1,
            batch_size=16,
            history_summarizer=summ,
        ),
        replay_buffer=buffer,
    )


def _env():
    return SyntheticAtari(height=H, width=W, frames=1, episode_len=5)


def _run(buffer, summ, seed=3, frame_channels=1, env=None, hw=(H, W)):
    return online_learning(
        _agent(buffer, summ, frame_channels, hw),
        env or _env(),
        num_envs=NUM_ENVS,
        max_steps=NUM_ENVS * 64,
        learn_every_k_steps=4,
        seed=seed,
    )


def _assert_params_equal(a, b):
    for x, y in zip(
        jax.tree.leaves(a.agent_state.learner.params),
        jax.tree.leaves(b.agent_state.learner.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ring_pipeline_bit_equal_to_stacking():
    """Same RNG stream -> identical episodes AND bit-identical trained
    params: the cursor-rotated conv kernel + validity masking reproduce the
    time-ordered window exactly (incl. zero padding at episode starts —
    episode_len=5 < 64 steps, so resets fire constantly)."""
    legacy = _run(
        VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS),
        StackingHistorySummarization(history_length=STACK, include_action=False),
    )
    ring = _run(
        VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS),
        FrameRingHistorySummarization(history_length=STACK),
    )
    np.testing.assert_array_equal(legacy.episode_returns, ring.episode_returns)
    _assert_params_equal(legacy, ring)
    # And the ring buffers hold identical frames.
    np.testing.assert_array_equal(
        np.asarray(legacy.agent_state.replay.storage["frame_s"]),
        np.asarray(ring.agent_state.replay.storage["frame_s"]),
    )


def test_ring_pipeline_bit_equal_multichannel():
    """fc > 1 (Breakout's 4-channel feature frames): the kernel roll moves
    whole fc-sized channel groups."""
    from pearl_tpu.envs import Breakout

    legacy = _run(
        VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS),
        StackingHistorySummarization(history_length=STACK, include_action=False),
        frame_channels=4,
        env=Breakout(),
        hw=(10, 10),
    )
    ring = _run(
        VisualReplayBuffer(capacity=512, stack=STACK, num_envs=NUM_ENVS),
        FrameRingHistorySummarization(history_length=STACK),
        frame_channels=4,
        env=Breakout(),
        hw=(10, 10),
    )
    np.testing.assert_array_equal(legacy.episode_returns, ring.episode_returns)
    _assert_params_equal(legacy, ring)


def test_ring_carry_is_o1_and_matches_materialize():
    """Unit-level: a hand-driven ring reproduces the stacking window via
    materialize(), through writes, resets and wrap-around."""
    summ = FrameRingHistorySummarization(history_length=STACK)
    stk = StackingHistorySummarization(history_length=STACK, include_action=False)
    B, F = 2, 4
    ring = summ.init_carry(B, F, 0)
    win = stk.init_carry(B, F, 0)
    key = jax.random.PRNGKey(0)
    for t in range(8):
        key, k = jax.random.split(key)
        obs = jax.random.normal(k, (B, F))
        ring = summ.observe(ring, obs, None)
        win = stk.observe(win, obs, None)
        np.testing.assert_allclose(
            np.asarray(ring.materialize()), np.asarray(stk.stored(win)),
            rtol=0, atol=0,
        )
        np.testing.assert_array_equal(
            np.asarray(summ.newest_frame(ring)), np.asarray(obs)
        )
        if t == 4:  # reset env 0 only
            done = jnp.array([True, False])
            ring = summ.reset_envs(ring, done)
            win = stk.reset_envs(win, done)
            np.testing.assert_array_equal(
                np.asarray(ring.materialize()), np.asarray(stk.stored(win))
            )


def test_ring_advance_fuses_observe_reset_observe():
    """advance(obs, reset_obs, done) == observe -> reset_envs -> observe(
    reset_obs) -> select, per env."""
    summ = FrameRingHistorySummarization(history_length=STACK)
    stk = StackingHistorySummarization(history_length=STACK, include_action=False)
    B, F = 3, 4
    ring = summ.init_carry(B, F, 0)
    win = stk.init_carry(B, F, 0)
    key = jax.random.PRNGKey(1)
    for t in range(7):
        key, k1, k2 = jax.random.split(key, 3)
        obs = jax.random.normal(k1, (B, F))
        reset_obs = jax.random.normal(k2, (B, F))
        done = jnp.array([t % 3 == 0, t % 2 == 0, False])
        ring = summ.advance(ring, obs, reset_obs, done)
        # Stacking equivalent (the agent's generic sequence).
        after = stk.observe(win, obs, None)
        fresh = stk.observe(stk.reset_envs(after, done), reset_obs, None)
        win = jnp.where(done[:, None, None], fresh, after)
        np.testing.assert_array_equal(
            np.asarray(ring.materialize()), np.asarray(stk.stored(win))
        )


def test_ring_view_shape_astype_protocol():
    summ = FrameRingHistorySummarization(history_length=STACK, dtype=jnp.bfloat16)
    carry = summ.init_carry(5, 7, 0)
    assert carry.shape == (5, STACK * 7)
    assert carry.dtype == jnp.bfloat16
    assert carry.astype(jnp.float32).ring.dtype == jnp.float32
    # forward() wraps replay-sampled arrays as a cursor-0 all-valid view.
    arr = jnp.ones((4, STACK * 7))
    view = summ.forward({}, arr)
    assert isinstance(view, FrameRingView)
    assert int(view.cursor) == 0
    assert bool(view.valid.all())


def test_ring_requires_frame_push_buffer():
    with pytest.raises(TypeError, match="frame-push"):
        _run(
            BasicReplayBuffer(capacity=512),
            FrameRingHistorySummarization(history_length=STACK),
        )


def test_dedup_next_reconstruction():
    """1-frame/row mode: next stacks come from successor rows; TERMINATED
    rows get a zero newest frame (invisible: TD masks them); TRUNCATED rows
    get their true final frame from the `frame_t` side ring (exact
    bootstrap); the newest resident push is never sampled."""
    B, T, CAP, F = 2, 3, 12, 4
    buf = VisualReplayBuffer(capacity=CAP, stack=T, num_envs=B, dedup_next=True)
    assert buf.min_pushes_before_sample == 2

    def rest(p, term=False, trunc=False):
        return TransitionBatch(
            state=None, action=jnp.zeros((B, 1)),
            reward=jnp.full((B,), float(p)), next_state=None,
            terminated=jnp.full((B,), term), truncated=jnp.full((B,), trunc),
            action_index=jnp.zeros((B,), jnp.int32),
        )

    ex = TransitionBatch(
        state=jnp.zeros((1, T * F)), action=jnp.zeros((1, 1)),
        reward=jnp.zeros((1,)), next_state=jnp.zeros((1, T * F)),
        terminated=jnp.zeros((1,), bool), truncated=jnp.zeros((1,), bool),
        action_index=jnp.zeros((1,), jnp.int32),
    )
    state = buf.init(ex)
    assert "frame_n" not in state.storage  # 1 frame/row: no next ring
    assert "frame_t" in state.storage  # truncation side ring
    # Pushes 0..4; push 2 terminates, push 3 TRUNCATES. frame_n of push p is
    # the true post-step observation, tagged 100+p so side-ring reads are
    # distinguishable from successor-row reads.
    for p in range(5):
        frame = jnp.full((B, F), float(p))
        frame_n = jnp.full((B, F), 100.0 + p)
        state = buf.push_frames(
            state, frame, frame_n, rest(p, term=p == 2, trunc=p == 3)
        )
    batch = buf.sample(state, jax.random.PRNGKey(0), 128)
    pushes = np.asarray(batch.reward).astype(int)
    states = np.asarray(batch.state).reshape(128, T, F)[:, :, 0]
    nexts = np.asarray(batch.next_state).reshape(128, T, F)[:, :, 0]
    assert pushes.max() <= 3  # newest resident push (4) excluded
    assert (pushes == 3).any()  # truncated push IS sampleable (exact now)
    for p, s_row, n_row in zip(pushes, states, nexts):
        assert s_row[-1] == p
        if p == 2:  # terminated row: zero newest next frame (TD-masked)
            assert n_row[-1] == 0.0
        elif p == 3:  # truncated row: exact final frame from the side ring
            assert n_row[-1] == 103.0
        else:  # successor reconstruction
            assert n_row[-1] == p + 1
        # next stack shares the state stack's newer frames shifted by one.
        np.testing.assert_array_equal(n_row[:-1], s_row[1:])


def test_dedup_next_stale_side_ring_never_read():
    """A lap later, a push WITHOUT truncation reuses a slot whose side slab
    holds stale data; the overwriting rows are not truncated, so the stale
    slab must be unreachable — and a NEW truncation in a reused slot must
    overwrite the slab."""
    B, T, CAP, F = 2, 2, 8, 4  # cap_pushes = 4
    buf = VisualReplayBuffer(capacity=CAP, stack=T, num_envs=B, dedup_next=True)
    ex = TransitionBatch(
        state=jnp.zeros((1, T * F)), action=jnp.zeros((1, 1)),
        reward=jnp.zeros((1,)), next_state=jnp.zeros((1, T * F)),
        terminated=jnp.zeros((1,), bool), truncated=jnp.zeros((1,), bool),
        action_index=jnp.zeros((1,), jnp.int32),
    )

    def rest(p, trunc):
        return TransitionBatch(
            state=None, action=jnp.zeros((B, 1)),
            reward=jnp.full((B,), float(p)), next_state=None,
            terminated=jnp.zeros((B,), bool), truncated=jnp.full((B,), trunc),
            action_index=jnp.zeros((B,), jnp.int32),
        )

    state = buf.init(ex)
    # Push 1 truncates (slot 1 side slab written), then a full lap of
    # non-truncating pushes overwrites every slot; push 9 (slot 1 again)
    # truncates with NEW data.
    for p in range(10):
        state = buf.push_frames(
            state,
            jnp.full((B, F), float(p)),
            jnp.full((B, F), 100.0 + p),
            rest(p, trunc=p in (1, 9)),
        )
    batch = buf.sample(state, jax.random.PRNGKey(1), 256)
    pushes = np.asarray(batch.reward).astype(int)
    nexts = np.asarray(batch.next_state).reshape(256, T, F)[:, :, 0]
    assert set(pushes) <= {7, 8}  # oldest haircut + newest excluded
    for p, n_row in zip(pushes, nexts):
        assert n_row[-1] == p + 1  # successor path; stale slab never read
    # Sanity: the rewritten slab holds push 9's frames, not push 1's.
    slot1 = np.asarray(state.storage["frame_t"][1 * B : 2 * B, 0])
    np.testing.assert_array_equal(slot1, np.full((B,), 109.0))


def test_dedup_next_ring_pipeline_trains():
    """End-to-end 1-frame/row: the driver runs and the learner stays
    finite; storage really is a single frame ring."""
    res = _run(
        VisualReplayBuffer(
            capacity=512, stack=STACK, num_envs=NUM_ENVS, dedup_next=True
        ),
        FrameRingHistorySummarization(history_length=STACK),
    )
    st = res.agent_state.replay.storage
    assert "frame_n" not in st
    assert st["frame_s"].shape == (512, H * W)
    for x in jax.tree.leaves(res.agent_state.learner.params):
        assert np.isfinite(np.asarray(x)).all()


def test_ring_bf16_trains():
    """bf16 ring + bf16 frames + bf16 act: the production visual config."""
    res = online_learning(
        PearlAgent(
            policy_learner=DeepQLearning(
                q_network=CNNQValueNetwork(
                    input_shape=(H, W, STACK), out_channels=(8, 8),
                    kernel_sizes=(3, 3), strides=(2, 1), paddings=(1, 1),
                    hidden_dims=(32,), time_major_stack=True,
                ),
                training_rounds=1, batch_size=16, act_dtype="bfloat16",
                history_summarizer=FrameRingHistorySummarization(
                    history_length=STACK, dtype=jnp.bfloat16
                ),
            ),
            replay_buffer=VisualReplayBuffer(
                capacity=512, stack=STACK, num_envs=NUM_ENVS,
                frame_dtype=jnp.bfloat16,
            ),
        ),
        SyntheticAtari(
            height=H, width=W, frames=1, episode_len=5, obs_dtype=jnp.bfloat16
        ),
        num_envs=NUM_ENVS, max_steps=NUM_ENVS * 64, learn_every_k_steps=4,
        seed=3,
    )
    assert len(res.episode_returns) > 0
    for x in jax.tree.leaves(res.agent_state.learner.params):
        assert np.isfinite(np.asarray(x)).all()
