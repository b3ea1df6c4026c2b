from pearl_tpu.policy_learners.exploration_modules.common import (
    BoltzmannExploration,
    TiebreakingStrategy,
    masked_argmax,
    masked_argmax_random_ties,
    masked_argmax_random_ties_batch,
    model_action_index,
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
    "TiebreakingStrategy",
    "masked_argmax",
    "masked_argmax_random_ties",
    "masked_argmax_random_ties_batch",
    "model_action_index",
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
