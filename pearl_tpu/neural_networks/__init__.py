from pearl_tpu.neural_networks.common import MLP, ConvNet
from pearl_tpu.neural_networks.value_networks import VanillaValueNetwork
from pearl_tpu.neural_networks.q_value_networks import (
    DuelingQValueNetwork,
    EnsembleQValueNetwork,
    MultiHeadQValueNetwork,
    QuantileQValueNetwork,
    TwoTowerQValueNetwork,
    VanillaQValueNetwork,
)
from pearl_tpu.neural_networks.actor_networks import (
    DynamicActionActorNetwork,
    GaussianActorNetwork,
    VanillaActorNetwork,
    VanillaContinuousActorNetwork,
)
from pearl_tpu.neural_networks.twin_critic import TwinCritic

__all__ = [
    "MLP",
    "ConvNet",
    "VanillaValueNetwork",
    "VanillaQValueNetwork",
    "MultiHeadQValueNetwork",
    "DuelingQValueNetwork",
    "QuantileQValueNetwork",
    "TwoTowerQValueNetwork",
    "EnsembleQValueNetwork",
    "VanillaActorNetwork",
    "DynamicActionActorNetwork",
    "VanillaContinuousActorNetwork",
    "GaussianActorNetwork",
    "TwinCritic",
]
