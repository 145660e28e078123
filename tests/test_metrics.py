"""Metric sanity + protocol tests (piq is unavailable in this environment, so
SSIM/HaarPSI are checked against analytic properties and an independent
numpy SSIM; PSNR/RMSE against the reference formulas in torch)."""

import numpy as np
import torch

import jax.numpy as jnp

from miccai24_immoco_tpu.ops.metrics import (
    calmetric2d,
    center_crop_quarter,
    haarpsi,
    normalize_batch,
    psnr,
    rmse,
    ssim,
)


def torch_my_psnr(img1, img2, data_range=1.0):
    mse = torch.mean((img1 - img2) ** 2, dim=(1, 2, 3))
    return (20 * torch.log10(data_range / torch.sqrt(mse))).mean()


def test_psnr_matches_reference_formula(rng):
    a = rng.random((3, 1, 8, 8)).astype(np.float32)
    b = rng.random((3, 1, 8, 8)).astype(np.float32)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(torch_my_psnr(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_rmse(rng):
    a = rng.random((2, 1, 6, 6)).astype(np.float32)
    b = rng.random((2, 1, 6, 6)).astype(np.float32)
    np.testing.assert_allclose(
        float(rmse(jnp.asarray(a), jnp.asarray(b))),
        np.sqrt(np.mean((a - b) ** 2)),
        rtol=1e-5,
    )


def test_normalize_batch_per_sample(rng):
    x = rng.random((2, 1, 4, 4)).astype(np.float32) * np.array([1, 100]).reshape(
        2, 1, 1, 1
    )
    n = np.asarray(normalize_batch(jnp.asarray(x)))
    for i in range(2):
        assert abs(n[i].min()) < 1e-5 and abs(n[i].max() - 1) < 1e-4


def numpy_ssim_valid(x, y, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent SSIM oracle: gaussian window, valid convolution."""
    from scipy.ndimage import correlate

    coords = np.arange(size) - (size - 1) / 2.0
    g1 = np.exp(-(coords**2) / (2 * sigma**2))
    g1 /= g1.sum()
    kern = np.outer(g1, g1)

    def filt(im):
        full = correlate(im, kern, mode="constant")
        r = size // 2
        return full[r:-r, r:-r]

    c1, c2 = k1**2, k2**2
    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx**2
    syy = filt(y * y) - my**2
    sxy = filt(x * y) - mx * my
    ss = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx**2 + my**2 + c1) * (sxx + syy + c2)
    )
    return ss.mean()


def test_ssim_matches_numpy_oracle(rng):
    x = rng.random((32, 32)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal((32, 32)).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(x)[None, None], jnp.asarray(y)[None, None]))
    oracle = numpy_ssim_valid(x, y)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_ssim_identity_and_ordering(rng):
    x = rng.random((1, 1, 40, 40)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-5
    y1 = np.clip(x + 0.05 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + 0.3 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    s1 = float(ssim(jnp.asarray(x), jnp.asarray(y1)))
    s2 = float(ssim(jnp.asarray(x), jnp.asarray(y2)))
    assert s1 > s2 > 0


def test_haarpsi_identity_and_ordering(rng):
    x = rng.random((1, 1, 64, 64)).astype(np.float32)
    same = float(haarpsi(jnp.asarray(x), jnp.asarray(x)))
    assert abs(same - 1.0) < 1e-3
    y1 = np.clip(x + 0.05 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + 0.4 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    h1 = float(haarpsi(jnp.asarray(x), jnp.asarray(y1)))
    h2 = float(haarpsi(jnp.asarray(x), jnp.asarray(y2)))
    assert 0 < h2 < h1 < 1.0


def test_calmetric2d_bundle(rng):
    x = rng.random((1, 1, 48, 48)).astype(np.float32)
    m = calmetric2d(jnp.asarray(x), jnp.asarray(x))
    assert float(m.ssim) > 0.999 and float(m.rmse) < 1e-6
    assert np.isfinite(float(m.haarpsi))


def test_center_crop_quarter():
    x = jnp.zeros((2, 1, 320, 320))
    assert center_crop_quarter(x).shape == (2, 1, 160, 160)
    y = jnp.arange(8 * 8).reshape(8, 8)
    c = center_crop_quarter(y)
    assert c.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(y[2:6, 2:6]))
