"""Downstream patch-evaluation tests."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.eval.downstream import (
    classification_conditions,
    evaluate_patches,
    extract_patches,
    run_downstream,
)


def test_extract_patches_matches_torch_reference(rng):
    """Golden test against the reference's exact affine-grid construction
    (classification_utils.py:241-262)."""
    img = rng.standard_normal((64, 64)).astype(np.float32)
    centers = np.asarray([[-0.3, 0.2], [0.5, -0.1]], np.float32)
    patch = 24

    size = (1, 1, patch, patch)
    grid = (
        F.affine_grid(
            torch.eye(2, 3).unsqueeze(0) * 0.2, size=size, align_corners=False
        ).view(1, 1, -1, 2)
        + torch.from_numpy(centers).unsqueeze(0).unsqueeze(2)
    )
    theirs = (
        F.grid_sample(
            torch.from_numpy(img)[None, None], grid.float(), align_corners=True
        )
        .view(-1, 1, patch, patch)
        .numpy()[:, 0]
    )

    ours = np.asarray(
        extract_patches(jnp.asarray(img), jnp.asarray(centers), patch)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_evaluate_patches_identity(rng):
    img = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    centers = np.asarray([[0.0, 0.0]], np.float32)
    m = evaluate_patches(img, img, centers, patch_size=24)
    assert m["ssim"] > 0.999 and m["rmse"] < 1e-6


def test_evaluate_patches_no_boxes_falls_back(rng):
    img = jnp.asarray(rng.random((32, 32)).astype(np.float32))
    m = evaluate_patches(img, img, None)
    assert m["ssim"] > 0.999


def test_run_downstream_pipeline(rng):
    from miccai24_immoco_tpu.data.synthetic import phantom_stack
    from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
    from miccai24_immoco_tpu.utils.hostio import get_complex

    images = phantom_stack(2, 32, 32, seed=1)
    corpus = {
        "kspace_motion": get_complex(fft2c(images)),
        "image_rss": get_complex(images),
        "mask": None,
    }
    corpus["mask"] = np.zeros((2, 32, 32), np.int32)
    boxes = [np.asarray([[0.0, 0.0]], np.float32), None]
    metrics = run_downstream(
        corpus, lambda ksp, mask: ifft2c(ksp), boxes, patch_size=12
    )
    assert len(metrics) == 2
    # Identity correction of uncorrupted data -> near-perfect metrics.
    assert metrics[0]["ssim"] > 0.99


def test_classification_conditions():
    acc = lambda patches, labels: (patches.mean() > 0.5) * 1.0
    out = classification_conditions(
        acc,
        {"motion_free": np.ones((2, 4, 4)), "corrupted": np.zeros((2, 4, 4))},
        np.asarray([0, 1]),
    )
    assert out == {"motion_free": 1.0, "corrupted": 0.0}
