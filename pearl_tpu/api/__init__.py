from pearl_tpu.api.types import ActionResult
from pearl_tpu.api.spaces import (
    BoxActionSpace,
    BoxSpace,
    DiscreteActionSpace,
    DiscreteSpace,
)
from pearl_tpu.api.environment import Environment

__all__ = [
    "ActionResult",
    "BoxActionSpace",
    "BoxSpace",
    "DiscreteActionSpace",
    "DiscreteSpace",
    "Environment",
]
