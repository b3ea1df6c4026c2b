from pearl_tpu.agent.pearl_agent import AgentState, PearlAgent

__all__ = ["PearlAgent", "AgentState"]
