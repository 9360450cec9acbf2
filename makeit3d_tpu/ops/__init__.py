from .activation import trunc_exp
from .encoding import FreqEncoder, HashGridEncoder, get_encoder
from .grid import (
    morton3d,
    morton3d_invert,
    packbits,
    DensityGrid,
)
from .marching import near_far_from_aabb, near_far_from_bound, march_rays
from .composite import composite_rays
from .sample_pdf import sample_pdf

__all__ = [
    "trunc_exp",
    "FreqEncoder",
    "HashGridEncoder",
    "get_encoder",
    "morton3d",
    "morton3d_invert",
    "packbits",
    "DensityGrid",
    "near_far_from_aabb",
    "near_far_from_bound",
    "march_rays",
    "composite_rays",
    "sample_pdf",
]
