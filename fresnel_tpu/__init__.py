"""fresnel-tpu: TPU-native single-image -> 3D Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CalebisGross/fresnel (see SURVEY.md).  The compute path is jit-compiled
XLA with Pallas kernels for the hot rasterization loops; parallelism is
expressed with jax.sharding over device meshes.
"""

__version__ = "0.1.0"

from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.core.camera import Camera

__all__ = ["GaussianCloud", "Camera", "__version__"]
