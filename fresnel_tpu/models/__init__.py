from fresnel_tpu.models.blocks import (
    MLP,
    PoseEncoder,
    FeatureInterpolator,
    DepthEncoder,
    fibonacci_spiral_positions,
    rotate_positions_for_pose,
    tensegrity_loss,
)
from fresnel_tpu.models.decoders import DirectPatchDecoder, PhysicsDirectPatchDecoder
from fresnel_tpu.models.fibonacci import FibonacciPatchDecoder
from fresnel_tpu.models.nca import NCAGaussianDecoder
from fresnel_tpu.models.saag_refine import SAAGRefinementNet, FeatureGuidedSAAG

__all__ = [
    "MLP", "PoseEncoder", "FeatureInterpolator", "DepthEncoder",
    "fibonacci_spiral_positions", "rotate_positions_for_pose",
    "tensegrity_loss", "DirectPatchDecoder", "PhysicsDirectPatchDecoder",
    "FibonacciPatchDecoder", "NCAGaussianDecoder", "SAAGRefinementNet",
    "FeatureGuidedSAAG",
]
