from pearl_tpu.safety_modules.identity import IdentitySafetyModule, SafetyModule
from pearl_tpu.safety_modules.risk_sensitive import (
    QuantileNetworkMeanVarianceSafetyModule,
    RiskNeutralSafetyModule,
    RiskSensitiveSafetyModule,
)
from pearl_tpu.safety_modules.reward_constrained import (
    RCSafetyModuleCostCriticContinuousAction,
)

__all__ = [
    "SafetyModule",
    "IdentitySafetyModule",
    "RiskSensitiveSafetyModule",
    "RiskNeutralSafetyModule",
    "QuantileNetworkMeanVarianceSafetyModule",
    "RCSafetyModuleCostCriticContinuousAction",
]
