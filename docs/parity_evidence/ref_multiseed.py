"""One (algo, seed) head-to-head run of the REFERENCE implementation."""
import json, sys, time

sys.path.insert(0, "/root/reference")
algo, seed = sys.argv[1], int(sys.argv[2])

from pearl.pearl_agent import PearlAgent
from pearl.policy_learners.sequential_decision_making.deep_q_learning import DeepQLearning
from pearl.policy_learners.sequential_decision_making.ppo import ProximalPolicyOptimization, PPOReplayBuffer
from pearl.policy_learners.sequential_decision_making.soft_actor_critic_continuous import ContinuousSoftActorCritic
from pearl.replay_buffers import BasicReplayBuffer
from pearl.action_representation_modules.one_hot_action_representation_module import OneHotActionTensorRepresentationModule
from pearl.utils.instantiations.environments.gym_environment import GymEnvironment
from pearl.utils.functional_utils.train_and_eval.online_learning import run_episode
from pearl.utils.functional_utils.experimentation.set_seed import set_seed

set_seed(seed)

if algo == "dqn":
    env = GymEnvironment("CartPole-v1"); target, max_eps, ma = 500.0, 1000, False
    n = env.action_space.n
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            state_dim=env.observation_space.shape[0], action_space=env.action_space,
            hidden_dims=[64, 64], training_rounds=20,
            action_representation_module=OneHotActionTensorRepresentationModule(max_number_actions=n)),
        replay_buffer=BasicReplayBuffer(10_000))
    kw = dict(learn_after_episode=True)
elif algo == "ppo":
    env = GymEnvironment("CartPole-v1"); target, max_eps, ma = 500.0, 1000, False
    n = env.action_space.n
    agent = PearlAgent(
        policy_learner=ProximalPolicyOptimization(
            action_space=env.action_space, state_dim=env.observation_space.shape[0],
            actor_hidden_dims=[64, 64], critic_hidden_dims=[64, 64],
            training_rounds=20, batch_size=32, epsilon=0.1,
            action_representation_module=OneHotActionTensorRepresentationModule(max_number_actions=n)),
        replay_buffer=PPOReplayBuffer(10_000))
    kw = dict(learn_after_episode=False, learn_every_k_steps=200)
elif algo == "csac":
    env = GymEnvironment("Pendulum-v1"); target, max_eps, ma = -250.0, 1500, False
    agent = PearlAgent(
        policy_learner=ContinuousSoftActorCritic(
            state_dim=env.observation_space.shape[0], action_space=env.action_space,
            actor_hidden_dims=[64, 64], critic_hidden_dims=[64, 64],
            training_rounds=50, batch_size=100, entropy_coef=0.1,
            actor_learning_rate=0.001, critic_learning_rate=0.001),
        replay_buffer=BasicReplayBuffer(100_000))
    kw = dict(learn_after_episode=True)
else:
    raise SystemExit(f"unknown algo {algo}")

t0 = time.time()
returns, total_steps, reached, steps_to_target = [], 0, False, None
for ep in range(max_eps):
    info, ep_steps = run_episode(agent=agent, env=env, learn=True, exploit=False,
                                 total_steps=total_steps, seed=seed, **kw)
    total_steps += ep_steps
    returns.append(float(info["return"]))
    # Same criterion as pearl_tpu's online_learning: moving average of the
    # last 20 finished episodes reaches the target.
    if len(returns) >= 20 and sum(returns[-20:]) / 20.0 >= target:
        reached, steps_to_target = True, total_steps
        break
print(json.dumps({
    "side": "reference", "algo": algo, "seed": seed, "reached": reached,
    "episodes": len(returns), "steps": total_steps, "steps_to_target": steps_to_target,
    "first20": sum(returns[:20]) / min(len(returns), 20),
    "last20": sum(returns[-20:]) / min(len(returns), 20),
    "wall_s": round(time.time() - t0, 1)}), flush=True)
