from pearl_tpu.training.online import OnlineResult, online_learning
from pearl_tpu.training.population import PopulationResult, population_learning
from pearl_tpu.training.host_loop import (
    agent_online_learning_host,
    online_learning_host,
    run_episode_host,
)

__all__ = [
    "online_learning",
    "OnlineResult",
    "population_learning",
    "PopulationResult",
    "agent_online_learning_host",
    "online_learning_host",
    "run_episode_host",
]
