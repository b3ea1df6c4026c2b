"""Learning-SIGNAL test over the full method registry (VERDICT round-1 item 4:
the smoke matrix asserted only finiteness — a loss wired to zero would pass).

Per registry row: fill the replay buffer with real rollouts, then FREEZE the
targets by marking every stored transition terminated (the Bellman target
collapses to the reward, so there is no moving bootstrap target) and run the
learner's own `learn` repeatedly on the same data. The row's primary loss
metric must (a) start non-trivially above zero and (b) fall substantially —
a learner whose loss is wired to zero, whose gradients don't flow, or whose
optimizer doesn't step fails one of the two assertions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pearl_tpu.benchmarks.configs import METHODS
from pearl_tpu.training import online_learning
from test_all_methods_matrix import env_for_method

# Primary loss metric per learner family, in lookup order.
_METRIC_PRIORITY = ("loss", "critic_loss", "value_loss")

# Per-row improvement thresholds (VERDICT r2 item 8), calibrated from a
# measured all-rows sweep (2026-08-21, 2-core CPU, seeds as in this test):
# the worst measured late/early ratio was 0.136 (CNNDQN) / 0.125 (CQL) —
# every other row measured <= 0.055. Thresholds are >= 2x the measured
# ratio, so a learner with a half-connected gradient path or a mis-scaled
# loss fails long before the old uniform late < 0.8*early would notice.
_RATIO_DEFAULT = 0.15
_RATIO_OVERRIDES = {
    "CNNDQN": 0.30,  # measured 0.136: conv stack fits the frozen set slower
    "CQL": 0.30,  # measured 0.125: the conservative penalty keeps |TD| up
    # VisualDQN: no override — at the 90-learn visual budget the measured
    # ratio is 0.018 (r4), an 8x margin under the 0.15 default (the old
    # 30-learn budget equilibrated at 0.40 and needed a loose 0.65 bar).
}
# Absolute floor for the TD families' |TD| metric on the frozen-regression
# task (max measured late value 0.158): the fitted residual must actually be
# SMALL, not merely smaller than an arbitrarily-large start.
_TD_LATE_FLOOR = 0.5
# (Discount-factor correctness is pinned separately against the analytic
# Bellman fixed point in tests/test_td_discount_calibration.py — gamma is
# inert on this frozen-target task.)


@pytest.mark.parametrize("name", sorted(METHODS.keys()))
def test_method_loss_improves_on_frozen_targets(name):
    method = METHODS[name]
    num_envs = 4
    agent = method.make_agent(num_envs)
    env = env_for_method(method, agent)
    rollout = method.on_policy_rollout
    if rollout is not None:
        from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer

        rollout = 16
        agent = dataclasses.replace(
            agent,
            replay_buffer=OnPolicyReplayBuffer(
                capacity=rollout * num_envs, num_envs=num_envs
            ),
        )
    fill_steps = (rollout or 32) * num_envs
    res = online_learning(
        agent, env, num_envs=num_envs, max_steps=fill_steps,
        learn_every_k_steps=rollout or 32, learn=False, seed=0,
    )
    astate = res.agent_state
    assert int(astate.replay.size) > 0, name

    # Freeze the targets: every stored transition is terminal, so TD-style
    # targets equal the stored reward and fitting them is pure regression on
    # a consistent (state, action) -> reward mapping.
    storage = astate.replay.storage
    if isinstance(storage, dict):
        # VisualReplayBuffer: non-visual fields live under "rest".
        rest = storage["rest"]
        rest = rest.replace(terminated=jnp.ones_like(rest.terminated))
        if float(jnp.abs(rest.reward).mean()) < 0.05:
            n = rest.reward.shape[0]
            dense = 1.0 + storage["frame_s"].reshape(n, -1).mean(axis=1)
            rest = rest.replace(reward=dense)
        storage = {**storage, "rest": rest}
    else:
        storage = storage.replace(terminated=jnp.ones_like(storage.terminated))
        if float(jnp.abs(storage.reward).mean()) < 0.05:
            # Sparse-reward envs (Breakout): the loss would start at ~0. Use
            # a dense deterministic function of the stored state as the
            # regression target instead.
            n = storage.reward.shape[0]
            dense = 1.0 + storage.state.reshape(n, -1).mean(axis=1)
            storage = storage.replace(reward=dense)
    buf_state = astate.replay.replace(storage=storage)

    learner = agent.for_env(env).policy_learner
    buffer = agent.replay_buffer
    n_learns = 90 if method.env_family.startswith("visual") else 60

    # On-policy learners re-consume the same frozen trajectories each round
    # (the buffer-clear lives at the agent level, not inside learner.learn);
    # off-policy learners resample from the frozen ring.
    @jax.jit
    def run(ls, bs, key):
        def one(carry, k):
            ls, bs = carry
            ls, bs, metrics = learner.learn(ls, buffer, bs, k)
            return (ls, bs), metrics

        keys = jax.random.split(key, n_learns)
        (ls, bs), metrics = jax.lax.scan(one, (ls, bs), keys)
        return metrics

    metrics = run(astate.learner, buf_state, jax.random.PRNGKey(1))
    key = next((k for k in _METRIC_PRIORITY if k in metrics), None)
    assert key is not None, (name, sorted(metrics))
    m = np.asarray(metrics[key])
    assert np.isfinite(m).all(), name
    early = float(np.mean(m[:3]))
    late = float(np.mean(m[-3:]))
    # (a) the loss is not wired to zero; (b) it falls to a calibrated
    # fraction of its start; (c) TD-family residuals end SMALL in absolute
    # terms, not just relatively.
    assert early > 1e-3, (name, key, early)
    ratio = _RATIO_OVERRIDES.get(name, _RATIO_DEFAULT)
    assert late < ratio * early, (name, key, early, late, ratio)
    if key == "loss":
        assert late < _TD_LATE_FLOOR, (name, key, late)
