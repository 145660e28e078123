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
    h: int = 320, w: int = 320, seed: int = 5, noise: bool = True
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
    img = np.clip(img, 0, None)
    phase = 0.4 * np.sin(yy / 23.0) * np.cos(xx / 17.0)
    return (img * np.exp(1j * phase)).astype(np.complex64)


def brain_phantom(h: int = 320, w: int = 320, seed: int = 5) -> jnp.ndarray:
    """(h, w) complex64 phantom on device (transfer-safe)."""
    return put_complex(brain_phantom_np(h, w, seed))


def phantom_stack(
    n: int, h: int = 320, w: int = 320, seed: int = 0, noise: bool = True
) -> jnp.ndarray:
    """(n, h, w) complex64 stack of distinct phantoms."""
    return put_complex(
        np.stack([brain_phantom_np(h, w, seed + i, noise=noise)
                  for i in range(n)])
    )
