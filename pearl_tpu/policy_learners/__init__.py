from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner

__all__ = ["PolicyLearner", "ActionChoice"]
