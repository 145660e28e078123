"""Downstream lesion-patch evaluation.

Capability parity with SURVEY.md C23:

- ``extract_patches``: patches around normalized lesion centers via the
  reference's affine-grid construction (classification_utils.py:241-262):
  a *fixed* 0.2-scaled identity grid (align_corners=False) offset by the
  normalized centers, sampled with align_corners=True zeros padding.
- ``evaluate_patches``: per-box quarter-free PSNR/SSIM/HaarPSI/RMSE means
  (classification_utils.py:275-304); falls back to whole-image metrics when
  a slice has no boxes.
- ``run_downstream``: correction method -> per-slice patch metrics
  (test_immoco_downstream.py:290-330 pipeline).
- ``classification_conditions``: classifier accuracy across motion-free /
  corrupted / corrected patch sets (test_classification.py:65-100).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.metrics import calmetric2d
from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample


def extract_patches(
    image: jnp.ndarray, centers: jnp.ndarray, patch_size: int = 124
) -> jnp.ndarray:
    """(H, W) image + (N, 2) normalized (x, y) centers -> (N, P, P) patches.

    Exactly replicates classification_utils.py:241-262: base grid from
    0.2 * eye affine with align_corners=False, shifted by centers, sampled
    with align_corners=True.
    """
    base = affine_grid(
        jnp.asarray([[0.2, 0.0, 0.0], [0.0, 0.2, 0.0]], jnp.float32),
        (patch_size, patch_size),
        align_corners=False,
    )  # (P, P, 2)
    grids = base[None] + centers[:, None, None, :]  # (N, P, P, 2)
    n = centers.shape[0]
    out = grid_sample(
        jnp.broadcast_to(image[None, None], (n, 1, *image.shape)),
        grids,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )
    return out[:, 0]


def evaluate_patches(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    centers: Optional[np.ndarray],
    patch_size: int = 124,
) -> Dict[str, float]:
    """Mean per-box metrics between |pred| and |gt| (H, W) magnitudes."""
    pred = jnp.abs(pred)
    gt = jnp.abs(gt)
    if centers is None or len(centers) == 0:
        m = calmetric2d(pred[None, None], gt[None, None])
        return {
            "ssim": float(m.ssim),
            "psnr": float(m.psnr),
            "haar_psi": float(m.haarpsi),
            "rmse": float(m.rmse),
        }
    c = jnp.asarray(np.asarray(centers, np.float32))
    p1 = extract_patches(pred, c, patch_size)
    p2 = extract_patches(gt, c, patch_size)
    vals = {"ssim": [], "psnr": [], "haar_psi": [], "rmse": []}
    for i in range(p1.shape[0]):
        m = calmetric2d(p1[i][None, None], p2[i][None, None])
        vals["ssim"].append(float(m.ssim))
        vals["psnr"].append(float(m.psnr))
        vals["haar_psi"].append(float(m.haarpsi))
        vals["rmse"].append(float(m.rmse))
    return {k: float(np.mean(v)) for k, v in vals.items()}


def run_downstream(
    corpus: dict,
    correct_fn: Callable[[jnp.ndarray, np.ndarray], jnp.ndarray],
    boxes_per_slice: Sequence[Optional[np.ndarray]],
    limit: Optional[int] = None,
    patch_size: int = 124,
) -> List[Dict[str, float]]:
    """correct_fn(kspace, mask) -> corrected complex image; boxes_per_slice
    holds (N_i, 2) normalized centers (or None)."""
    from miccai24_immoco_tpu.utils.hostio import put_complex

    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    masks_all = corpus.get("mask")
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    metrics = []
    for i in range(n):
        ksp = put_complex(ks_all[i])
        corrected = correct_fn(
            ksp, None if masks_all is None else masks_all[i]
        )
        metrics.append(
            evaluate_patches(
                corrected,
                put_complex(gt_all[i]),
                boxes_per_slice[i] if i < len(boxes_per_slice) else None,
                patch_size,
            )
        )
    return metrics


def classification_conditions(
    eval_acc: Callable[[np.ndarray, np.ndarray], float],
    patch_sets: Dict[str, np.ndarray],
    labels: np.ndarray,
) -> Dict[str, float]:
    """Accuracy across correction conditions (test_classification.py:85-100):
    patch_sets maps condition name (motion_free / corrupted_light /
    corrected_immoco / ...) to (N, P, P) patches sharing `labels`."""
    return {name: float(eval_acc(p, labels)) for name, p in patch_sets.items()}
