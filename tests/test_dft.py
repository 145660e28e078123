"""Centered-DFT-matmul (ops/dft.py) parity vs the FFT pair (ops/fft.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.ops.dft import centered_dft_statics, fft2c_mm
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c


def _rand_complex(rng, shape):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)


@pytest.mark.parametrize("shape", [(8, 8), (17, 24), (3, 21, 15), (320, 320)])
def test_fft2c_mm_matches_fft2c(rng, shape):
    # Odd sizes exercise the asymmetric fftshift/ifftshift ordering.
    x = jnp.asarray(_rand_complex(rng, shape))
    dft = centered_dft_statics(shape[-2], shape[-1])
    got = fft2c_mm(x, dft)
    want = fft2c(x)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4 * scale
    )


@pytest.mark.parametrize("shape", [(16, 16), (13, 10)])
def test_ifft2c_mm_matches_ifft2c(rng, shape):
    x = jnp.asarray(_rand_complex(rng, shape))
    dft = centered_dft_statics(shape[-2], shape[-1], inverse=True)
    got = fft2c_mm(x, dft)
    want = ifft2c(x)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4 * scale
    )


def test_roundtrip(rng):
    x = jnp.asarray(_rand_complex(rng, (24, 24)))
    fwd = centered_dft_statics(24, 24)
    inv = centered_dft_statics(24, 24, inverse=True)
    back = fft2c_mm(fft2c_mm(x, fwd), inv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def _small_cfg(kop):
    return InstanceFitConfig(
        iters=2,
        max_movements=3,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        kspace_op=kop,
    )


def test_forward_model_parity(rng):
    """The full IM-MoCo forward (warp + masks + k-space composition) agrees
    between the FFT and DFT-matmul k-space operators."""
    h = w = 32
    masks = np.zeros((3, h, w), np.float32)
    masks[0, :, 4:9] = 1.0
    masks[1, :, 20:22] = 1.0
    masks = jnp.asarray(masks)

    m_fft = build_immoco(_small_cfg("fft"), h, w)
    m_dft = build_immoco(_small_cfg("dft_mm"), h, w)
    params = m_fft.init(jax.random.PRNGKey(0))

    k_fft, img_fft = jax.jit(m_fft.forward)(params, masks, m_fft.statics)
    k_dft, img_dft = jax.jit(m_dft.forward)(params, masks, m_dft.statics)

    np.testing.assert_allclose(np.asarray(img_dft), np.asarray(img_fft))
    scale = float(jnp.abs(k_fft).max()) + 1e-12
    np.testing.assert_allclose(
        np.asarray(k_dft), np.asarray(k_fft), atol=5e-4 * scale
    )


def test_gradient_parity(rng):
    """Gradients through the DFT-matmul path agree with the FFT path."""
    h = w = 16
    masks_np = np.zeros((3, h, w), np.float32)
    masks_np[0, :, 2:5] = 1.0
    masks = jnp.asarray(masks_np)
    m_fft = build_immoco(_small_cfg("fft"), h, w)
    m_dft = build_immoco(_small_cfg("dft_mm"), h, w)
    params = m_fft.init(jax.random.PRNGKey(1))
    target = jnp.asarray(_rand_complex(rng, (h, w)))

    def loss(model, statics):
        def f(p):
            k, _ = model.forward(p, masks, statics)
            d = k - target
            return jnp.mean(d.real**2 + d.imag**2)

        return jax.jit(jax.grad(f))

    g_fft = loss(m_fft, m_fft.statics)(params)
    g_dft = loss(m_dft, m_dft.statics)(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fft)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dft)
    scale = float(jnp.abs(flat_f).max()) + 1e-12
    np.testing.assert_allclose(
        np.asarray(flat_d), np.asarray(flat_f), atol=1e-3 * scale
    )
