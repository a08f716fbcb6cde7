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
from fresnel_tpu.models.slat import (
    DirectSLatDecoder, MLPSLatDecoder, DirectStructurePredictor)
from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer
from fresnel_tpu.models.encoders import (
    create_depth_estimator, create_feature_extractor)

__all__ = [
    "MLP", "PoseEncoder", "FeatureInterpolator", "DepthEncoder",
    "fibonacci_spiral_positions", "rotate_positions_for_pose",
    "tensegrity_loss", "DirectPatchDecoder", "PhysicsDirectPatchDecoder",
    "FibonacciPatchDecoder", "NCAGaussianDecoder", "SAAGRefinementNet",
    "FeatureGuidedSAAG", "DirectSLatDecoder", "MLPSLatDecoder",
    "DirectStructurePredictor", "CVSConfig", "ConsistencyViewSynthesizer",
    "create_depth_estimator", "create_feature_extractor",
]
