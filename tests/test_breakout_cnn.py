"""Breakout env dynamics + CNN Q-network end-to-end (the Atari-path stand-in)."""

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs.breakout import Breakout
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def test_breakout_dynamics():
    env = Breakout()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (10 * 10 * 4,)
    grid = np.asarray(obs).reshape(10, 10, 4)
    assert grid[..., 0].sum() == 1  # one paddle cell
    assert grid[..., 1].sum() == 1  # one ball cell
    assert grid[..., 3].sum() == 30  # 3 brick rows x 10

    # Play with a 1-step-lookahead tracking policy across auto-restarting
    # episodes: bricks must get hit and episodes must last a sensible time.
    # (Some trajectories are physically unwinnable — after corner bounces the
    # ball can outrun the paddle — faithful to MinAtar dynamics.)
    total_reward, ep_len, ep_lens = 0.0, 0, []
    for i in range(300):
        ball_col = int(np.asarray(state.ball)[1])
        dcol = int(np.asarray(state.ddir)[1])
        target = min(max(ball_col + dcol, 0), 9)
        paddle = int(np.asarray(state.paddle))
        a = 2 if target > paddle else (0 if target < paddle else 1)
        state, result = env.step(state, jnp.array([a], jnp.float32), jax.random.PRNGKey(i))
        total_reward += float(result.reward)
        ep_len += 1
        if bool(result.terminated):
            ep_lens.append(ep_len)
            ep_len = 0
            state, _ = env.reset(jax.random.PRNGKey(1000 + i))
    assert total_reward >= 2.0  # bricks got hit repeatedly
    assert max(ep_lens + [ep_len]) >= 10  # episodes last


def test_cnn_dqn_on_breakout():
    env = Breakout()
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(10, 10, 4),
                out_channels=(16,),
                kernel_sizes=(3,),
                strides=(1,),
                paddings=(1,),
                hidden_dims=(64,),
            ),
            training_rounds=1,
            batch_size=16,
        ),
        replay_buffer=BasicReplayBuffer(capacity=512),
    )
    res = online_learning(
        agent, env, num_envs=4, max_steps=160, learn_every_k_steps=8,
        learning_starts=32, seed=0,
    )
    ls = res.agent_state.learner
    assert int(ls.step) > 0
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(ls.params))
