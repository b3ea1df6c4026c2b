from pearl_tpu.action_representation_modules.modules import (
    ActionRepresentationModule,
    BinaryActionRepresentation,
    IdentityActionRepresentation,
    OneHotActionRepresentation,
)

__all__ = [
    "ActionRepresentationModule",
    "IdentityActionRepresentation",
    "OneHotActionRepresentation",
    "BinaryActionRepresentation",
]
