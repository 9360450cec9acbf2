"""makeit3d_tpu: TPU-native single-image-to-3D framework.

A from-scratch JAX/XLA/Pallas rebuild of the Make-It-3D capability surface
(coarse NeRF optimization with diffusion/CLIP priors + point-cloud refine
stage). See SURVEY.md at the repo root for the reference analysis this
build follows.
"""

__version__ = "0.1.0"

from .config import Config, stage1_config, stage2_config

__all__ = ["Config", "stage1_config", "stage2_config", "__version__"]
