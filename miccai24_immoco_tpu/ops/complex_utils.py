"""Complex-tensor helpers mirroring the reference data utilities.

Covers torch ``view_as_real``/``view_as_complex`` equivalents plus the
reference's idiosyncratic RSS coil combine and image normalization
(src/utils/data_utils.py:37-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_to_real_pair(x: jnp.ndarray) -> jnp.ndarray:
    """(...,) complex -> (..., 2) real; torch.view_as_real equivalent."""
    return jnp.stack([x.real, x.imag], axis=-1)


def real_pair_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) real -> (...,) complex; torch.view_as_complex equivalent."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def rss_complex(data: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Root-sum-of-squares coil combine, applied separately to Re and Im.

    Replicates the reference quirk (data_utils.py:60-75): RSS is computed on
    the real and imaginary parts independently and recombined as
    ``sqrt(sum(Re^2)) + i*sqrt(sum(Im^2))`` — NOT the magnitude RSS used by
    the fastMRI package.  The whole corpus pipeline depends on this, so we
    keep it bit-compatible.
    """
    rss_real = jnp.sqrt(jnp.sum(data.real**2, axis=axis))
    rss_imag = jnp.sqrt(jnp.sum(data.imag**2, axis=axis))
    return jax.lax.complex(rss_real, rss_imag)


def normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """Normalize by the magnitude's min/max (data_utils.py:37-45).

    Note the reference normalizes the (possibly complex) image using the
    *magnitude* extrema; degenerate ranges fall back to an offset.
    """
    mag = jnp.abs(image)
    lo = mag.min()
    hi = mag.max()
    rng = hi - lo
    return jnp.where(rng < 1e-12, image - lo + 1e-12, (image - lo) / rng)


def scale_image(image: jnp.ndarray, scale=None) -> jnp.ndarray:
    """Divide by max magnitude (or an explicit scale); data_utils.py:48-52."""
    if scale is None:
        return image / jnp.abs(image).max()
    return image / scale
