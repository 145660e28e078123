"""Numeric operator library (layer L1/L2 of SURVEY.md)."""

from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.complex_utils import (
    complex_to_real_pair,
    real_pair_to_complex,
    rss_complex,
    normalize_image,
    scale_image,
)
from miccai24_immoco_tpu.ops.losses import (
    gradient_entropy,
    tv_loss,
    real_pair_mse,
)

__all__ = [
    "fft2c",
    "ifft2c",
    "complex_to_real_pair",
    "real_pair_to_complex",
    "rss_complex",
    "normalize_image",
    "scale_image",
    "gradient_entropy",
    "tv_loss",
    "real_pair_mse",
]
