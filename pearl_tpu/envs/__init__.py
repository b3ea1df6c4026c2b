from pearl_tpu.envs.cartpole import CartPole
from pearl_tpu.envs.pendulum import Pendulum
from pearl_tpu.envs.frozen_lake import FrozenLake
from pearl_tpu.envs.vector import VectorEnv

__all__ = ["CartPole", "Pendulum", "FrozenLake", "VectorEnv"]
