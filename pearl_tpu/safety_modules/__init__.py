from pearl_tpu.safety_modules.identity import IdentitySafetyModule, SafetyModule

__all__ = ["SafetyModule", "IdentitySafetyModule"]
