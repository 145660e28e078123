"""Noise-free-GT supplementary metrics (*_clean columns).

Rigid k-space motion corruption is unitary, so a corrupted image keeps the
noisy GT's exact noise realization and scores an inflated PSNR against it,
while a denoising reconstruction is penalized by the noisy-GT floor
(PERFORMANCE.md heavy-PSNR diagnosis).  The synthetic protocol therefore
carries a noise-free twin of every phantom and reports *_clean metric
columns alongside the reference protocol's noisy-GT ones.
"""

import numpy as np

import jax.numpy as jnp

from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.data.synthetic import brain_phantom_np
from miccai24_immoco_tpu.eval.harness import aggregate
from miccai24_immoco_tpu.eval.runners import run_immoco_batched


def test_noise_free_phantom_same_structure():
    noisy = brain_phantom_np(64, 64, seed=11, noise=True)
    clean = brain_phantom_np(64, 64, seed=11, noise=False)
    diff = np.abs(noisy) - np.abs(clean)
    # Same structural content (blob RNG stream aligned): the difference is
    # bounded by the clipped 0.05-sigma texture term, not by structure.
    assert np.abs(diff).max() < 0.4
    assert np.abs(diff).std() > 0.01  # the noise term is actually present
    assert not np.allclose(noisy, clean)


def test_synthetic_corpus_carries_clean_twin():
    corpus = _synthetic_corpus(2, 64, "light", seed=3)
    assert "image_clean" in corpus
    assert corpus["image_clean"].shape == corpus["image_rss"].shape
    assert not np.allclose(corpus["image_clean"], corpus["image_rss"])


def test_batched_runner_emits_clean_columns():
    corpus = _synthetic_corpus(2, 64, "light", seed=3)
    cfg = InstanceFitConfig(
        iters=2,
        max_movements=4,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
    )
    metrics = run_immoco_batched(
        corpus, cfg, kld=None, batch_size=2, segment_len=2
    )
    assert len(metrics) == 2
    for m in metrics:
        for k in ("ssim", "psnr", "haar_psi", "rmse"):
            assert k in m and f"{k}_clean" in m
    agg = aggregate(metrics)
    assert "psnr_clean" in agg and "psnr" in agg
