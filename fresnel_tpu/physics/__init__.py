from fresnel_tpu.physics.fresnel_zones import (
    FresnelZones,
    PhysicsFresnelZones,
    MultiWavelengthPhysics,
    constrain_wavelength,
    sobel_gradients,
)
from fresnel_tpu.physics.edge_detector import FresnelEdgeDetector
from fresnel_tpu.physics.diffraction import (
    FresnelDiffraction,
    DiffractiveLayer,
    MultiscaleDiffractiveLayer,
)

__all__ = [
    "FresnelZones",
    "PhysicsFresnelZones",
    "MultiWavelengthPhysics",
    "FresnelEdgeDetector",
    "FresnelDiffraction",
    "DiffractiveLayer",
    "MultiscaleDiffractiveLayer",
    "constrain_wavelength",
    "sobel_gradients",
]
