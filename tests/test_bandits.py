"""Contextual bandits: LinearRegression correctness vs closed form, LinUCB on
a synthetic linear env (ground-truth recovery), disjoint container, MAB
sanity, and exploration-module behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs.bandit import (
    LinearSyntheticBanditEnvironment,
    RewardIsTenTimesActionMABEnvironment,
)
from pearl_tpu.neural_networks.contextual_bandit import LinearRegression, append_ones
from pearl_tpu.policy_learners.contextual_bandits import (
    DisjointBanditContainer,
    LinearBandit,
    NeuralLinearBandit,
)
from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    SquareCBExploration,
    ThompsonSamplingExplorationLinear,
    UCBExploration,
)
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.training import online_learning


def test_linear_regression_matches_closed_form():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 3).astype(np.float32)
    w_true = np.array([0.5, -1.0, 2.0, 0.3])  # [intercept, w...]
    y = (append_ones(jnp.asarray(X)) @ jnp.asarray(w_true)).astype(jnp.float32)
    weights = rng.uniform(0.5, 2.0, 200).astype(np.float32)

    lr = LinearRegression(feature_dim=3, l2_reg_lambda=0.0)
    state = lr.init()
    # Two partial updates must equal one big update (additivity).
    state = lr.update(state, jnp.asarray(X[:120]), y[:120], jnp.asarray(weights[:120]))
    state = lr.update(state, jnp.asarray(X[120:]), y[120:], jnp.asarray(weights[120:]))
    np.testing.assert_allclose(np.asarray(lr.coefs(state)), w_true, atol=1e-3)

    # sigma shrinks as data accumulates.
    x0 = jnp.asarray(X[:1])
    fresh_sigma = lr.calculate_sigma(lr.init(), x0)
    # Fresh state with lambda=0 is singular; use ridge for the comparison.
    lr_r = LinearRegression(feature_dim=3, l2_reg_lambda=1.0)
    s0 = lr_r.init()
    s1 = lr_r.update(s0, jnp.asarray(X), y, jnp.asarray(weights))
    assert float(lr_r.calculate_sigma(s1, x0)[0]) < float(lr_r.calculate_sigma(s0, x0)[0])


def test_linear_regression_discounting_matches_reference_ground_truth():
    """Replays the reference's exact discounting protocol in numpy
    (linear_regression.py:222-239 apply_discounting on ridge-free _A/_b;
    linear_bandit.py:123-140 trigger on accumulated sum_weight) and checks
    our jitted stream produces the same coefficients."""
    rng = np.random.RandomState(7)
    gamma, interval, lam, d = 0.8, 10.0, 1.0, 3
    lr = LinearRegression(
        feature_dim=d, l2_reg_lambda=lam, gamma=gamma, apply_discounting_interval=interval
    )
    state = lr.init()

    A_ref = np.zeros((d + 1, d + 1))  # reference stores _A WITHOUT ridge
    b_ref = np.zeros(d + 1)
    sum_w, last_discount_w = 0.0, 0.0
    for _ in range(12):
        X = rng.randn(4, d).astype(np.float32)
        y = rng.randn(4).astype(np.float32)
        w = rng.uniform(0.5, 1.5, 4).astype(np.float32)
        state = lr.update(state, jnp.asarray(X), jnp.asarray(y), jnp.asarray(w))
        Xe = np.concatenate([np.ones((4, 1)), X], axis=1)
        A_ref += (Xe * w[:, None]).T @ Xe
        b_ref += (Xe * w[:, None]).T @ y
        sum_w += w.sum()
        if sum_w - last_discount_w >= interval:
            A_ref *= gamma
            b_ref *= gamma
            last_discount_w = sum_w
    coefs_ref = np.linalg.solve(A_ref + lam * np.eye(d + 1), b_ref)
    np.testing.assert_allclose(np.asarray(lr.coefs(state)), coefs_ref, atol=1e-4)
    np.testing.assert_allclose(float(state.sum_weight), sum_w, rtol=1e-5)


def test_linear_regression_thompson_sampling_spread():
    lr = LinearRegression(feature_dim=2)
    state = lr.init()
    samples = jnp.stack(
        [lr.sample_coefs(state, jax.random.PRNGKey(i)) for i in range(32)]
    )
    assert float(jnp.std(samples)) > 0.1  # prior uncertainty visible


def _run_bandit(learner, env, num_envs=16, steps=2048):
    agent = PearlAgent(
        policy_learner=learner,
        replay_buffer=BasicReplayBuffer(capacity=num_envs),
    )
    return online_learning(
        agent, env, num_envs=num_envs, max_steps=steps, learn_every_k_steps=1,
        seed=0,
    )


def test_linucb_learns_synthetic_linear_env():
    env = LinearSyntheticBanditEnvironment(seed=3)
    res = _run_bandit(
        LinearBandit(exploration=UCBExploration(alpha=1.0)), env, steps=4096
    )
    # Evaluate greedily: average reward should be near the best achievable.
    state = res.agent_state
    learner = LinearBandit(exploration=UCBExploration(alpha=1.0)).bind(env.action_space)
    key = jax.random.PRNGKey(42)
    contexts = jax.random.uniform(key, (256, env.observation_dim), minval=-1, maxval=1)
    _, choice = learner.act(state.learner, contexts, None, key, exploit=True)
    means = jax.vmap(env._mean_rewards)(contexts)
    chosen = jnp.take_along_axis(means, choice.index[:, None], axis=1)[:, 0]
    regret = jnp.mean(jnp.max(means, axis=1) - chosen)
    assert float(regret) < 0.1, float(regret)


def test_thompson_and_squarecb_smoke():
    env = LinearSyntheticBanditEnvironment(seed=1)
    for expl in (ThompsonSamplingExplorationLinear(), SquareCBExploration(gamma=50.0)):
        res = _run_bandit(LinearBandit(exploration=expl), env, steps=512)
        assert np.isfinite(np.asarray(res.agent_state.learner.model.A)).all()


def test_mab_ten_times_action():
    env = RewardIsTenTimesActionMABEnvironment(num_arms=4)
    res = _run_bandit(
        DisjointBanditContainer(exploration=UCBExploration(alpha=40.0)), env, steps=2048
    )
    learner = DisjointBanditContainer(exploration=UCBExploration(alpha=40.0)).bind(
        env.action_space
    )
    _, choice = learner.act(
        res.agent_state.learner,
        jnp.zeros((8, 1)),
        None,
        jax.random.PRNGKey(0),
        exploit=True,
    )
    assert np.all(np.asarray(choice.index) == 3)


def _disjoint_ground_truth_batch(num_arms=3, feat=4, n=4096, seed=0, per_arm_states=False):
    """Per-arm linear ground truth r = w_arm . x, mirroring the reference's
    test_disjoint_bandit_container_learning_from_ground_truth.py."""
    from pearl_tpu.replay_buffers.transition import TransitionBatch

    rng = np.random.RandomState(seed)
    W = rng.uniform(-1, 1, (num_arms, feat)).astype(np.float32)
    if per_arm_states:
        state = rng.uniform(-1, 1, (n, num_arms, feat)).astype(np.float32)
    else:
        state = rng.uniform(-1, 1, (n, feat)).astype(np.float32)
    idx = rng.randint(0, num_arms, (n,)).astype(np.int32)
    x_taken = state[np.arange(n), idx] if per_arm_states else state
    reward = np.einsum("nf,nf->n", x_taken, W[idx]).astype(np.float32)
    batch = TransitionBatch(
        state=jnp.asarray(state),
        action=jnp.asarray(idx[:, None], jnp.float32),
        reward=jnp.asarray(reward),
        next_state=jnp.asarray(state),
        terminated=jnp.ones((n,), bool),
        truncated=jnp.zeros((n,), bool),
        action_index=jnp.asarray(idx),
        weight=jnp.ones((n,)),
    )
    return W, batch


def test_disjoint_container_linear_arms_recover_ground_truth():
    """Each LinearBandit arm's WLS coefficients converge to its own w_arm
    (reference test :68-172), and greedy acting picks the best arm."""
    W, batch = _disjoint_ground_truth_batch()
    from pearl_tpu.api.spaces import DiscreteActionSpace

    space = DiscreteActionSpace.discrete(3)
    learner = DisjointBanditContainer(
        exploration=UCBExploration(alpha=0.0), l2_reg_lambda=1e-4
    ).bind(space)
    state = learner.init(jax.random.PRNGKey(0), 4, space, 8)
    state, _ = learner.learn_batch(state, batch)
    # Recovered per-arm coefficients (skip intercept) match the ground truth.
    from pearl_tpu.neural_networks.contextual_bandit import LinearRegression

    lr = LinearRegression(feature_dim=4)
    coefs = jax.vmap(lambda s: lr.coefs(s))(state.models)  # (A, 1+f)
    np.testing.assert_allclose(np.asarray(coefs[:, 1:]), W, atol=0.02)
    # Greedy acting picks the argmax arm per context.
    ctx = np.random.RandomState(1).uniform(-1, 1, (64, 4)).astype(np.float32)
    _, choice = learner.act(state, jnp.asarray(ctx), None, jax.random.PRNGKey(1), exploit=True)
    np.testing.assert_array_equal(np.asarray(choice.index), (ctx @ W.T).argmax(1))


def test_disjoint_container_neural_arms_learn_ground_truth():
    """NeuralBandit arms (vmapped stacked params — the reference's arbitrary
    per-arm learners, disjoint_bandit.py:77-162) learn a per-arm reward."""
    from pearl_tpu.api.spaces import DiscreteActionSpace
    from pearl_tpu.policy_learners.contextual_bandits import NeuralBandit

    W, batch = _disjoint_ground_truth_batch(seed=2)
    space = DiscreteActionSpace.discrete(3)
    learner = DisjointBanditContainer(
        arm_learner=NeuralBandit(hidden_dims=(32, 32), learning_rate=3e-3),
        exploration=UCBExploration(alpha=0.0),
    ).bind(space)
    state = learner.init(jax.random.PRNGKey(0), 4, space, 8)

    @jax.jit
    def epoch(state, _):
        state, _m = learner.learn_batch(state, batch)
        return state, None

    state, _ = jax.lax.scan(epoch, state, None, length=300)
    ctx = np.random.RandomState(1).uniform(-1, 1, (256, 4)).astype(np.float32)
    mu, _ = learner.mu_sigma(state, learner.arm_features(jnp.asarray(ctx)))
    true = ctx @ W.T
    assert float(jnp.mean((mu - true) ** 2)) < 0.01
    _, choice = learner.act(state, jnp.asarray(ctx), None, jax.random.PRNGKey(1), exploit=True)
    assert (np.asarray(choice.index) == true.argmax(1)).mean() > 0.95


def test_disjoint_container_heterogeneous_mixed_arms():
    """A LIST of per-arm learners with MIXED types (reference
    disjoint_bandit.py:77-90 accepts arbitrary ContextualBanditBase instances
    per arm): arms [linear, linear, neural] recover the known per-arm reward
    function — the two linear arms via one vmapped group, the neural arm via
    its own — and greedy acting picks the best arm."""
    from pearl_tpu.api.spaces import DiscreteActionSpace
    from pearl_tpu.policy_learners.contextual_bandits import NeuralBandit

    W, batch = _disjoint_ground_truth_batch(seed=6)
    space = DiscreteActionSpace.discrete(3)
    learner = DisjointBanditContainer(
        arm_learner=[
            LinearBandit(l2_reg_lambda=1e-4),
            LinearBandit(l2_reg_lambda=1e-4),
            NeuralBandit(hidden_dims=(32, 32), learning_rate=3e-3),
        ],
        exploration=UCBExploration(alpha=0.0),
    ).bind(space)
    # Two groups: the identical linear arms fold into one vmapped stack.
    groups = learner._groups()
    assert [idxs for _, idxs in groups] == [[0, 1], [2]]
    state = learner.init(jax.random.PRNGKey(0), 4, space, 8)

    @jax.jit
    def epoch(state, _):
        state, _m = learner.learn_batch(state, batch)
        return state, None

    # Closed-form linear arms converge in one fold; the neural arm needs
    # epochs (it re-consumes the same frozen batch).
    state, _ = jax.lax.scan(epoch, state, None, length=300)

    from pearl_tpu.neural_networks.contextual_bandit import LinearRegression

    lr = LinearRegression(feature_dim=4)
    lin_coefs = jax.vmap(lambda s: lr.coefs(s))(state.models[0])  # (2, 1+f)
    np.testing.assert_allclose(np.asarray(lin_coefs[:, 1:]), W[:2], atol=0.02)

    ctx = np.random.RandomState(1).uniform(-1, 1, (256, 4)).astype(np.float32)
    mu, _ = learner.mu_sigma(state, learner.arm_features(jnp.asarray(ctx)))
    true = ctx @ W.T
    assert float(jnp.mean((mu - true) ** 2)) < 0.01
    _, choice = learner.act(
        state, jnp.asarray(ctx), None, jax.random.PRNGKey(1), exploit=True
    )
    assert (np.asarray(choice.index) == true.argmax(1)).mean() > 0.95


def test_disjoint_container_heterogeneous_arm_count_mismatch():
    from pearl_tpu.api.spaces import DiscreteActionSpace

    space = DiscreteActionSpace.discrete(3)
    learner = DisjointBanditContainer(
        arm_learner=[LinearBandit(), LinearBandit()],
        exploration=UCBExploration(alpha=0.0),
    ).bind(space)
    import pytest

    with pytest.raises(ValueError, match="arm learners"):
        learner.init(jax.random.PRNGKey(0), 4, space, 8)


def test_disjoint_container_per_arm_3d_states():
    """3-D (B, num_arms, f) per-arm states route state[:, i, :] to arm i
    (reference disjoint_bandit.py:92-100)."""
    from pearl_tpu.api.spaces import DiscreteActionSpace

    W, batch = _disjoint_ground_truth_batch(per_arm_states=True, seed=4)
    space = DiscreteActionSpace.discrete(3)
    learner = DisjointBanditContainer(
        exploration=UCBExploration(alpha=0.0), l2_reg_lambda=1e-4
    ).bind(space)
    state = learner.init(jax.random.PRNGKey(0), 4, space, 8)
    state, _ = learner.learn_batch(state, batch)
    from pearl_tpu.neural_networks.contextual_bandit import LinearRegression

    lr = LinearRegression(feature_dim=4)
    coefs = jax.vmap(lambda s: lr.coefs(s))(state.models)
    np.testing.assert_allclose(np.asarray(coefs[:, 1:]), W, atol=0.03)


def test_neural_linear_bandit_smoke():
    env = LinearSyntheticBanditEnvironment(seed=2)
    res = _run_bandit(
        NeuralLinearBandit(
            exploration=UCBExploration(alpha=1.0), training_rounds=1, batch_size=16
        ),
        env,
        steps=256,
    )
    sw = float(res.agent_state.learner.linreg.sum_weight)
    assert sw > 0


def test_separate_uncertainty_activation_placement():
    """Reference neural_linear_bandit.py:261-314: `separate_uncertainty`
    moves the output activation around the UCB bonus —
      joint (False):    score = act(mu_pre + alpha * sigma)
      separate (True):  score = act(mu_pre) + alpha * sigma
    — verified against hand-computed placements from the model's own
    pre-activation forward."""
    key = jax.random.PRNGKey(0)
    alpha = 2.0

    def build(separate):
        lb = NeuralLinearBandit(
            exploration=UCBExploration(alpha=alpha),
            output_activation="sigmoid",
            separate_uncertainty=separate,
            hidden_dims=(16,),
            linear_feature_dim=8,
        )
        from pearl_tpu.api.spaces import DiscreteActionSpace

        space = DiscreteActionSpace.create(jnp.eye(3))
        lb = lb.bind(space)
        state = lb.init(key, 4, space, 2)
        return lb, state

    subj = jax.random.normal(jax.random.PRNGKey(1), (5, 4))

    lb_j, st_j = build(False)
    lb_s, st_s = build(True)
    # Same init key -> identical params.
    feats = lb_j.arm_features(subj)
    B, A, f = feats.shape
    nlr = lb_j._nlr(feature_dim=f)
    params = {
        "mlp": st_j.mlp_params, "head": st_j.head_params, "linreg": st_j.linreg
    }
    mu_pre, sigma, _ = nlr.forward_with_intermediate_values(
        params, feats.reshape(B * A, f)
    )
    mu_pre = mu_pre.reshape(B, A)
    sigma = jnp.nan_to_num(sigma.reshape(B, A), nan=0.0)

    joint = lb_j.get_scores(st_j, subj)
    sep = lb_s.get_scores(st_s, subj)
    np.testing.assert_allclose(
        np.asarray(joint), np.asarray(jax.nn.sigmoid(mu_pre + alpha * sigma)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sep), np.asarray(jax.nn.sigmoid(mu_pre) + alpha * sigma),
        rtol=1e-5,
    )
    # The placements genuinely differ (nonlinear activation, nonzero sigma)...
    assert float(np.max(np.abs(np.asarray(joint - sep)))) > 1e-3
    # ...and with the default linear activation the knob is inert.
    lb_lin_j, st_lin = build(False)
    lb_lin_j = dataclasses.replace(lb_lin_j, output_activation="linear")
    lb_lin_s = dataclasses.replace(lb_lin_j, separate_uncertainty=True)
    np.testing.assert_allclose(
        np.asarray(lb_lin_j.get_scores(st_lin, subj)),
        np.asarray(lb_lin_s.get_scores(st_lin, subj)),
        rtol=1e-6,
    )


def test_neural_linear_bandit_sigmoid_head_recovers_ground_truth():
    """output_activation="sigmoid": rewards are sigmoid(w.x); the activated
    e2e head must fit them (predictions near the true probabilities), in
    BOTH uncertainty placements."""
    k = jax.random.PRNGKey(3)
    w = jnp.array([1.5, -2.0, 0.8, 0.0])

    from pearl_tpu.api.spaces import DiscreteActionSpace
    from pearl_tpu.replay_buffers.transition import TransitionBatch

    for separate in (False, True):
        lb = NeuralLinearBandit(
            exploration=UCBExploration(alpha=0.1),
            output_activation="sigmoid",
            separate_uncertainty=separate,
            hidden_dims=(32,),
            linear_feature_dim=8,
            learning_rate=3e-3,
            state_features_only=True,
        )
        space = DiscreteActionSpace.create(jnp.eye(2))
        lb = lb.bind(space)
        state = lb.init(jax.random.PRNGKey(0), 4, space, 1)
        key = k
        for i in range(300):
            key, k1 = jax.random.split(key)
            x = jax.random.normal(k1, (64, 4))
            y = jax.nn.sigmoid(x @ w)
            batch = TransitionBatch(
                state=x, action=jnp.zeros((64, 1)), reward=y,
                next_state=x, terminated=jnp.ones((64,), bool),
                truncated=jnp.zeros((64,), bool),
                action_index=jnp.zeros((64,), jnp.int32),
            )
            state, metrics = lb.learn_batch(state, batch)
        assert float(metrics["loss"]) < 0.01, (separate, float(metrics["loss"]))
