"""Synthetic brain-like phantoms.

The frozen fastMRI corpora the reference trains/evaluates on are not
redistributable; this module provides deterministic complex phantoms with
comparable structure (skull ring, soft-tissue blobs, mild texture and phase)
for tests, benchmarks, and training smoke runs.  The real-data path lives in
data/fastmri_io.py and produces identically-shaped tensors.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from miccai24_immoco_tpu.utils.hostio import put_complex


def brain_phantom_np(
    h: int = 320, w: int = 320, seed: int = 5, noise: bool = True,
    texture: float = 0.0, texture_sigma: float = 2.0,
) -> np.ndarray:
    """(h, w) complex64 phantom on host.

    ``noise=False`` returns the same phantom with the additive texture-noise
    term zeroed (the random draw is still consumed, so the structural RNG
    stream — blob placement — is identical to the noisy variant).  Used as
    the clean ground truth for the noise-floor-corrected PSNR protocol:
    rigid k-space motion corruption is unitary, so a corrupted image keeps
    the GT's exact noise realization and scores an inflated PSNR against the
    noisy GT, while any denoising reconstruction is penalized by the
    ~24-26 dB noisy-GT floor (PERFORMANCE.md, heavy-PSNR diagnosis).

    ``texture``: amplitude of STRUCTURED (gaussian-low-pass, sigma
    ``texture_sigma`` px) texture added inside the brain region.  Unlike
    the white ``noise`` term, this texture is anatomy-like: it survives
    bilinear resampling (rotations interpolate it instead of destroying
    the realization) and it makes SSIM decay under motion corruption the
    way real fastMRI anatomy does — the smooth default phantom holds
    corrupted SSIM ~0.9+ at corruption levels where the reference's
    corpora sit at ~0.7-0.85 (round-4 hard-scenario calibration).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    cy, cx = h / 2, w / 2
    r = np.sqrt(((yy - cy) / (0.42 * h)) ** 2 + ((xx - cx) / (0.36 * w)) ** 2)
    img += np.clip(1.2 * np.exp(-((r - 0.92) ** 2) / 0.004), 0, None)  # skull
    img += 0.8 * (r < 0.88)  # brain
    for _ in range(24):
        ccy, ccx = rng.uniform(0.3, 0.7, 2) * [h, w]
        ry, rx = rng.uniform(0.02, 0.12, 2) * [h, w]
        img += rng.uniform(-0.35, 0.5) * np.exp(
            -(((yy - ccy) / ry) ** 2 + ((xx - ccx) / rx) ** 2)
        )
    tex = rng.standard_normal((h, w)).astype(np.float32)
    img += 0.05 * tex if noise else 0.0
    if texture > 0.0:
        # Structured texture: gaussian-low-pass white noise (FFT filter),
        # unit-RMS-normalized, masked to the brain interior.
        t = rng.standard_normal((h, w)).astype(np.float32)
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.fftfreq(w)[None, :]
        g = np.exp(
            -2.0 * (np.pi * texture_sigma) ** 2 * (fy**2 + fx**2)
        ).astype(np.float32)
        t = np.fft.ifft2(np.fft.fft2(t) * g).real.astype(np.float32)
        t /= max(float(t.std()), 1e-12)
        img += texture * t * (r < 0.88)
    img = np.clip(img, 0, None)
    phase = 0.4 * np.sin(yy / 23.0) * np.cos(xx / 17.0)
    return (img * np.exp(1j * phase)).astype(np.complex64)


def brain_phantom(h: int = 320, w: int = 320, seed: int = 5) -> jnp.ndarray:
    """(h, w) complex64 phantom on device (transfer-safe)."""
    return put_complex(brain_phantom_np(h, w, seed))


def phantom_stack(
    n: int, h: int = 320, w: int = 320, seed: int = 0, noise: bool = True,
    texture: float = 0.0, texture_sigma: float = 2.0,
) -> jnp.ndarray:
    """(n, h, w) complex64 stack of distinct phantoms."""
    return put_complex(
        np.stack([
            brain_phantom_np(h, w, seed + i, noise=noise, texture=texture,
                             texture_sigma=texture_sigma)
            for i in range(n)
        ])
    )
