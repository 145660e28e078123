"""Golden tests: centered FFT pair vs the torch reference convention
(reference src/utils/data_utils.py:29-34)."""

import numpy as np
import pytest
import torch
import torch.fft as tfft

import jax.numpy as jnp

from miccai24_immoco_tpu.ops import fft2c, ifft2c


def torch_fft(x):
    return tfft.fftshift(
        tfft.fftn(tfft.ifftshift(x, dim=(-2, -1)), dim=(-2, -1)), dim=(-2, -1)
    )


def torch_ifft(x):
    return tfft.ifftshift(
        tfft.ifftn(tfft.fftshift(x, dim=(-2, -1)), dim=(-2, -1)), dim=(-2, -1)
    )


@pytest.mark.parametrize("shape", [(8, 8), (7, 9), (3, 16, 16), (2, 5, 11)])
def test_fft_matches_torch(rng, shape):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )
    ours = np.asarray(fft2c(jnp.asarray(x)))
    theirs = torch_fft(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [(8, 8), (7, 9), (2, 5, 11)])
def test_ifft_matches_torch(rng, shape):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )
    ours = np.asarray(ifft2c(jnp.asarray(x)))
    theirs = torch_ifft(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_roundtrip(rng):
    x = (rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))).astype(
        np.complex64
    )
    back = np.asarray(ifft2c(fft2c(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_forward_is_unnormalized(rng):
    # Impulse at center -> flat spectrum of ones (unnormalized forward).
    x = np.zeros((8, 8), np.complex64)
    x[4, 4] = 1.0
    spec = np.asarray(fft2c(jnp.asarray(x)))
    np.testing.assert_allclose(spec, np.ones_like(spec), atol=1e-5)
