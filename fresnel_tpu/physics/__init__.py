from fresnel_tpu.physics.fresnel_zones import (
    FresnelZones,
    PhysicsFresnelZones,
    MultiWavelengthPhysics,
    constrain_wavelength,
    sobel_gradients,
)
from fresnel_tpu.physics.edge_detector import FresnelEdgeDetector

__all__ = [
    "FresnelZones",
    "PhysicsFresnelZones",
    "MultiWavelengthPhysics",
    "FresnelEdgeDetector",
    "constrain_wavelength",
    "sobel_gradients",
]
