from pearl_tpu.training.online import OnlineResult, online_learning

__all__ = ["online_learning", "OnlineResult"]
