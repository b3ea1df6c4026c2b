from pearl_tpu.policy_learners.sequential_decision_making.deep_td import (
    DeepQLearning,
    DeepSARSA,
    DeepTDLearning,
    DoubleDQN,
)
from pearl_tpu.policy_learners.sequential_decision_making.qr_dqn import (
    QuantileRegressionDeepQLearning,
)
from pearl_tpu.policy_learners.sequential_decision_making.bootstrapped_dqn import (
    BootstrappedDQN,
)
from pearl_tpu.policy_learners.sequential_decision_making.actor_critic_base import (
    ActorCriticBase,
)
from pearl_tpu.policy_learners.sequential_decision_making.sac import SoftActorCritic
from pearl_tpu.policy_learners.sequential_decision_making.sac_continuous import (
    ContinuousSoftActorCritic,
)
from pearl_tpu.policy_learners.sequential_decision_making.ddpg import (
    DeepDeterministicPolicyGradient,
)
from pearl_tpu.policy_learners.sequential_decision_making.td3 import TD3, TD3BC

from pearl_tpu.policy_learners.sequential_decision_making.ppo import (
    ProximalPolicyOptimization,
)
from pearl_tpu.policy_learners.sequential_decision_making.reinforce import REINFORCE
from pearl_tpu.policy_learners.sequential_decision_making.iql import ImplicitQLearning

__all__ = [
    "DeepTDLearning",
    "DeepQLearning",
    "DoubleDQN",
    "DeepSARSA",
    "QuantileRegressionDeepQLearning",
    "BootstrappedDQN",
    "ActorCriticBase",
    "SoftActorCritic",
    "ContinuousSoftActorCritic",
    "DeepDeterministicPolicyGradient",
    "TD3",
    "TD3BC",
    "ProximalPolicyOptimization",
    "REINFORCE",
    "ImplicitQLearning",
]
