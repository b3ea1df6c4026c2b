from pearl_tpu.policy_learners.contextual_bandits.base import ContextualBanditBase
from pearl_tpu.policy_learners.contextual_bandits.linear_bandit import LinearBandit
from pearl_tpu.policy_learners.contextual_bandits.neural_bandit import NeuralBandit
from pearl_tpu.policy_learners.contextual_bandits.neural_linear_bandit import (
    NeuralLinearBandit,
)
from pearl_tpu.policy_learners.contextual_bandits.disjoint import (
    DisjointBanditContainer,
)

__all__ = [
    "ContextualBanditBase",
    "LinearBandit",
    "NeuralBandit",
    "NeuralLinearBandit",
    "DisjointBanditContainer",
]
