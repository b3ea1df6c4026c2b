from pearl_tpu.policy_learners.exploration_modules.common import (
    BoltzmannExploration,
    EGreedyExploration,
    ExplorationModule,
    NoExploration,
    NormalDistributionExploration,
    PropensityExploration,
    Warmup,
)
from pearl_tpu.policy_learners.exploration_modules.contextual_bandits import (
    BanditExplorationModule,
    FastCBExploration,
    SquareCBExploration,
    ThompsonSamplingExplorationLinear,
    UCBExploration,
    VanillaUCBExploration,
)
from pearl_tpu.policy_learners.exploration_modules.deep_exploration import (
    DeepExploration,
)

__all__ = [
    "ExplorationModule",
    "EGreedyExploration",
    "NoExploration",
    "BoltzmannExploration",
    "PropensityExploration",
    "NormalDistributionExploration",
    "Warmup",
    "DeepExploration",
    "BanditExplorationModule",
    "UCBExploration",
    "VanillaUCBExploration",
    "ThompsonSamplingExplorationLinear",
    "SquareCBExploration",
    "FastCBExploration",
]
