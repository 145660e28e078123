"""HaarPSI vs an independent transcription of the official MATLAB algorithm.

The reference computes HaarPSI through piq (evaluate.py:77), which is a
validated port of the official MATLAB implementation (Reisenhofer et al.,
"A Haar wavelet-based perceptual similarity index", 2018).  piq is not
available in this environment, so the oracle below is a direct NumPy/scipy
transcription of the official MATLAB code (HaarPSI.m): conv2(...,'same')
semantics emulated by cropping the full convolution at offset K//2 per axis
(MATLAB's central part for even kernels), filters 2^-s * ones(2^s) with the
top half negated, zero-padded subsampling, C=30, alpha=4.2.
"""

import numpy as np
import pytest
from scipy.signal import convolve2d

import jax.numpy as jnp

from miccai24_immoco_tpu.ops.metrics import haarpsi


def _conv2_same_matlab(x: np.ndarray, f: np.ndarray) -> np.ndarray:
    """MATLAB conv2(x, f, 'same'): central part of the full convolution.
    For even kernels MATLAB's crop starts at K//2 (numpy/scipy 'same' uses
    (K-1)//2, which differs — hence the explicit full+crop)."""
    full = convolve2d(x, f, mode="full")
    kh, kw = f.shape
    sh, sw = kh // 2, kw // 2
    return full[sh : sh + x.shape[0], sw : sw + x.shape[1]]


def _haarpsi_matlab(img_ref: np.ndarray, img_dist: np.ndarray,
                    subsample: bool = True) -> float:
    """Transcription of the official HaarPSI.m (grayscale path)."""
    c, alpha = 30.0, 4.2
    x, y = img_ref.astype(np.float64), img_dist.astype(np.float64)
    if subsample:
        k = np.ones((2, 2)) / 4.0
        x = _conv2_same_matlab(x, k)[::2, ::2]
        y = _conv2_same_matlab(y, k)[::2, ::2]

    n_scales = 3

    def dec(img):
        coeffs = []
        for scale in range(1, n_scales + 1):
            n = 2**scale
            f = (2.0**-scale) * np.ones((n, n))
            f[: n // 2, :] = -f[: n // 2, :]
            coeffs.append((_conv2_same_matlab(img, f),
                           _conv2_same_matlab(img, f.T)))
        return coeffs

    cx, cy = dec(x), dec(y)
    sims, weights = [], []
    for ori in range(2):
        w = np.maximum(np.abs(cx[2][ori]), np.abs(cy[2][ori]))
        a1, b1 = np.abs(cx[0][ori]), np.abs(cy[0][ori])
        a2, b2 = np.abs(cx[1][ori]), np.abs(cy[1][ori])
        s = ((2 * a1 * b1 + c) / (a1**2 + b1**2 + c)
             + (2 * a2 * b2 + c) / (a2**2 + b2**2 + c)) / 2.0
        sims.append(s)
        weights.append(w)
    sims = np.stack(sims)
    weights = np.stack(weights)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    r = (sigmoid(alpha * sims) * weights).sum() / weights.sum()
    return float((np.log(r / (1 - r)) / alpha) ** 2)


def _textured(rng, h, w):
    base = rng.random((-(-h // 4), -(-w // 4)))
    img = np.kron(base, np.ones((4, 4)))[:h, :w]
    img += 0.05 * rng.standard_normal((h, w))
    return np.clip(img, 0, 1)


@pytest.mark.parametrize("shape", [(64, 64), (62, 58)])
@pytest.mark.parametrize("subsample", [True, False])
def test_haarpsi_matches_official_transcription(rng, shape, subsample):
    h, w = shape
    ref = _textured(rng, h, w)
    dist = np.clip(ref + 0.08 * rng.standard_normal((h, w)), 0, 1)
    want = _haarpsi_matlab(ref * 255.0, dist * 255.0, subsample=subsample)
    got = float(
        haarpsi(
            jnp.asarray(ref, jnp.float32)[None, None],
            jnp.asarray(dist, jnp.float32)[None, None],
            subsample=subsample,
        )
    )
    assert got == pytest.approx(want, abs=2e-3), (got, want)


def test_haarpsi_identity_is_one(rng):
    ref = _textured(rng, 64, 64)
    got = float(
        haarpsi(jnp.asarray(ref, jnp.float32)[None, None],
                jnp.asarray(ref, jnp.float32)[None, None])
    )
    assert got == pytest.approx(1.0, abs=1e-3)


def test_haarpsi_monotone_in_distortion(rng):
    ref = _textured(rng, 64, 64)
    scores = []
    for sigma in (0.02, 0.08, 0.25):
        dist = np.clip(ref + sigma * rng.standard_normal(ref.shape), 0, 1)
        scores.append(
            float(
                haarpsi(jnp.asarray(ref, jnp.float32)[None, None],
                        jnp.asarray(dist, jnp.float32)[None, None])
            )
        )
    assert scores[0] > scores[1] > scores[2]
