"""Centered 2-D FFT pair with the reference's exact shift/normalization
convention.

The reference (src/utils/data_utils.py:29-34) defines

    FFT(x)  = fftshift( fftn( ifftshift(x, (-2,-1)), (-2,-1) ), (-2,-1) )
    IFFT(x) = ifftshift( ifftn( fftshift(x, (-2,-1)), (-2,-1) ), (-2,-1) )

i.e. an *unnormalized* forward transform and a 1/N inverse (torch default
norm="backward"), with the asymmetric shift ordering preserved verbatim:
the inverse applies ``fftshift`` first and ``ifftshift`` last.  For even
sizes the two shifts coincide, but for odd sizes they differ — we replicate
the reference ordering exactly so golden tests against torch match
bit-for-bit on any shape.

Everything here is jit-safe and dtype-preserving (complex64 in/out).
"""

from __future__ import annotations

import jax.numpy as jnp

_AXES = (-2, -1)


def fft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered unnormalized 2-D FFT over the last two axes."""
    return jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(x, axes=_AXES), axes=_AXES), axes=_AXES
    )


def ifft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered 2-D inverse FFT (1/N normalization) over the last two axes."""
    return jnp.fft.ifftshift(
        jnp.fft.ifftn(jnp.fft.fftshift(x, axes=_AXES), axes=_AXES), axes=_AXES
    )


# Aliases matching the reference spelling for discoverability.
FFT = fft2c
IFFT = ifft2c
