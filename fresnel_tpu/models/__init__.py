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

__all__ = [
    "MLP", "PoseEncoder", "FeatureInterpolator", "DepthEncoder",
    "fibonacci_spiral_positions", "rotate_positions_for_pose",
    "tensegrity_loss", "DirectPatchDecoder", "PhysicsDirectPatchDecoder",
]
