from pearl_tpu.envs.cartpole import CartPole
from pearl_tpu.envs.pendulum import Pendulum
from pearl_tpu.envs.frozen_lake import FrozenLake
from pearl_tpu.envs.classic import Acrobot, ContinuousMountainCar, MountainCar
from pearl_tpu.envs.sparse_reward import (
    ContinuousSparseRewardEnvironment,
    DiscreteSparseRewardEnvironment,
)
from pearl_tpu.envs.bandit import (
    ClassificationBanditEnvironment,
    LinearSyntheticBanditEnvironment,
    RewardIsTenTimesActionMABEnvironment,
)
from pearl_tpu.envs.wrappers import (
    DynamicActionSpaceWrapper,
    FlattenDictObservations,
    FlattenObservations,
    OneHotObservationsFromDiscrete,
    PartialObservabilityWrapper,
    SafetyWrapper,
    SparseRewardWrapper,
)
from pearl_tpu.envs.breakout import Breakout
from pearl_tpu.envs.synthetic_visual import SyntheticAtari
from pearl_tpu.envs.puckworld import PuckWorld
from pearl_tpu.envs.ple import Catcher, FlappyBird, Pixelcopter, Pong
from pearl_tpu.envs.recsys import RecommenderEnvironment
from pearl_tpu.envs.misc import (
    FixedNumberOfStepsEnvironment,
    MeanVarBanditEnvironment,
)
from pearl_tpu.envs.vector import VectorEnv

__all__ = [
    "CartPole",
    "Pendulum",
    "FrozenLake",
    "Acrobot",
    "MountainCar",
    "ContinuousMountainCar",
    "DiscreteSparseRewardEnvironment",
    "ContinuousSparseRewardEnvironment",
    "LinearSyntheticBanditEnvironment",
    "RewardIsTenTimesActionMABEnvironment",
    "ClassificationBanditEnvironment",
    "PartialObservabilityWrapper",
    "SparseRewardWrapper",
    "SafetyWrapper",
    "DynamicActionSpaceWrapper",
    "FlattenDictObservations",
    "FlattenObservations",
    "OneHotObservationsFromDiscrete",
    "Breakout",
    "SyntheticAtari",
    "PuckWorld",
    "Catcher",
    "FlappyBird",
    "Pixelcopter",
    "Pong",
    "RecommenderEnvironment",
    "MeanVarBanditEnvironment",
    "FixedNumberOfStepsEnvironment",
    "VectorEnv",
]
