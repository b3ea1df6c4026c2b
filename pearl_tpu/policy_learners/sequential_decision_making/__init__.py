from pearl_tpu.policy_learners.sequential_decision_making.deep_td import (
    DeepQLearning,
    DeepSARSA,
    DoubleDQN,
)

__all__ = ["DeepQLearning", "DoubleDQN", "DeepSARSA"]
