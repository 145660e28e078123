"""Synthetic lesion corpus for the downstream classification task.

The reference's downstream pipeline (SURVEY.md C20, C23) extracts 124x124
patches around fastMRI+ bounding-box centers and trains/evaluates a 2-class
ResNet-18 on them (classification_utils.py:346-393, test_classification.py).
The fastMRI+ corpus is not redistributable; this module manufactures
deterministic phantoms carrying one of the two reference classes
(classification_utils.py:31-39):

- class 0, "Nonspecific white matter lesion": a small bright blob inside
  the brain parenchyma;
- class 1, "Craniotomy": a localized skull-ring defect (the ring is
  interrupted and depressed over a ~40 degree arc).

Each sample records the lesion's normalized (x, y) center in the exact
convention of eval/downstream.extract_patches (grid offset added to the
0.2-scaled affine base grid), so the patch pipeline is shared verbatim with
the real-annotation path (data/annotations.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


# "subtle" lesion geometry, tuned via scripts/probe_lesion_cue.py (matched-
# template separability under corruption) and probe_lesion_recovery.py
# (drop-and-recover through the actual IM-MoCo fit).  The original round-2
# geometry (ring radius 7 px, sigma 1.8, blob sigma 4.5, amp 0.45-0.6) kept
# a ~6-sigma cue gap even under heavy ghosting, so classifier accuracy
# saturated at 1.0 for every condition — no condition gap.  The current
# geometry sits at the measured edge of the classifier's generalization
# window (scripts/probe_clf_protocol.py, trained-backbone ResNet18 on 256
# motion-free patches): amp .10-.16 -> held-out free 0.969 / heavy-
# corrupted 0.938; amp >= .22 saturates at 1.0 under EVERY condition
# (rigid ghosting is unitary — the cue is replicated, not destroyed, and a
# strong net learns it anyway); amp <= .13 collapses to chance (the net
# memorizes).  The reference's larger gap (0.77 -> ~0.55,
# test_classification.py:65-100) rides on real pathology + an
# ImageNet-frozen-backbone head, neither of which exists in this
# environment — the head-only and distinct-task-transfer protocols were
# measured at/near chance on the subtle cue (PERFORMANCE.md round 2).
SUBTLE_GEOM: Dict[str, float] = {
    "ring_radius": 2.5,
    "ring_sigma": 0.9,
    "blob_sigma": 1.8,
    "amp_lo": 0.10,
    "amp_hi": 0.16,
}


def lesion_phantom_np(
    h: int = 320, w: int = 320, seed: int = 0, cls: int = 0,
    variant: str = "distinct",
    subtle_geom: Dict[str, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> ((h, w) complex64 phantom, (2,) normalized (x, y) lesion center).

    ``variant``:

    - ``"distinct"`` (default, the shipped ``classifier_synthetic`` corpus):
      white-matter blob vs craniotomy — a gross morphological difference
      that survives motion corruption, so classifier accuracy saturates at
      1.0 under every condition (no condition gap to report).
    - ``"subtle"``: both classes are a small parenchymal lesion at the SAME
      rng-drawn location over a CLASS-INDEPENDENT background (the anatomy
      stream is seeded by ``seed`` alone, so lesion morphology is the only
      class signal): class 0 a solid Gaussian blob, class 1 a thin
      ring-enhancing rim of the same extent, at an amplitude tuned to the
      classifier's generalization edge (SUBTLE_GEOM note).  Measured
      condition table (48 held-out slices, trained-backbone ResNet18,
      artifacts/classification_subtle): motion-free 0.958 /
      heavy-corrupted 0.917 / IM-MoCo-corrected 0.958 (the reference
      protocol's drop-and-recover ordering, test_classification.py:65-100)
      and denoiser 0.58-0.65 (IM-MoCo preserves the cue that image-space
      denoising destroys — the reference's headline downstream claim).
    """
    rng = (np.random.default_rng(seed) if variant == "subtle"
           else np.random.default_rng(seed * 2 + cls))
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    cy, cx = h / 2, w / 2
    ry_ax, rx_ax = 0.42 * h, 0.36 * w
    r = np.sqrt(((yy - cy) / ry_ax) ** 2 + ((xx - cx) / rx_ax) ** 2)
    skull = np.clip(1.2 * np.exp(-((r - 0.92) ** 2) / 0.004), 0, None)
    img = 0.8 * (r < 0.88)
    for _ in range(24):
        ccy, ccx = rng.uniform(0.3, 0.7, 2) * [h, w]
        bry, brx = rng.uniform(0.02, 0.12, 2) * [h, w]
        img += rng.uniform(-0.35, 0.5) * np.exp(
            -(((yy - ccy) / bry) ** 2 + ((xx - ccx) / brx) ** 2)
        )

    if variant == "subtle":
        g = dict(SUBTLE_GEOM)
        if subtle_geom:
            g.update(subtle_geom)
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(0.15, 0.55)
        ly = cy + rad * ry_ax * np.sin(ang)
        lx = cx + rad * rx_ax * np.cos(ang)
        amp = rng.uniform(g["amp_lo"], g["amp_hi"])
        d2 = (yy - ly) ** 2 + (xx - lx) ** 2
        if cls == 0:
            # Solid blob: Gaussian disc.
            img += amp * np.exp(-d2 / g["blob_sigma"] ** 2)
        else:
            # Ring-enhancing rim: thin shell at ring_radius — same location
            # and brightness as the blob; only internal fine structure
            # differs.
            img += amp * np.exp(
                -((np.sqrt(d2) - g["ring_radius"]) ** 2)
                / g["ring_sigma"] ** 2
            )
    elif cls == 0:
        # White-matter-like lesion: bright compact blob in the parenchyma.
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(0.15, 0.55)
        ly = cy + rad * ry_ax * np.sin(ang)
        lx = cx + rad * rx_ax * np.cos(ang)
        lr = rng.uniform(0.012, 0.025) * min(h, w)
        img += rng.uniform(0.55, 0.85) * np.exp(
            -(((yy - ly) ** 2 + (xx - lx) ** 2) / lr**2)
        )
    else:
        # Craniotomy: interrupt + depress the skull ring over an arc and
        # flatten the adjacent brain edge (bone-flap removal signature).
        ang = rng.uniform(0, 2 * np.pi)
        theta = np.arctan2((yy - cy) / ry_ax, (xx - cx) / rx_ax)
        dtheta = np.angle(np.exp(1j * (theta - ang)))
        arc = np.exp(-((dtheta / 0.35) ** 2))
        skull = skull * (1.0 - 0.95 * arc)
        img = img - 0.35 * arc * np.clip((r - 0.72) / 0.16, 0, 1) * (r < 0.88)
        ly = cy + 0.92 * ry_ax * np.sin(ang)
        lx = cx + 0.92 * rx_ax * np.cos(ang)

    img = np.clip(img + skull, 0, None)
    img += 0.04 * rng.standard_normal((h, w)).astype(np.float32)
    img = np.clip(img, 0, None)
    phase = 0.4 * np.sin(yy / 23.0) * np.cos(xx / 17.0)
    phantom = (img * np.exp(1j * phase)).astype(np.complex64)
    # Normalized center, align_corners=True convention of extract_patches'
    # grid offsets (x, y) in [-1, 1].
    center = np.asarray(
        [2.0 * lx / (w - 1) - 1.0, 2.0 * ly / (h - 1) - 1.0], np.float32
    )
    return phantom, center


def lesion_corpus(
    n: int, h: int = 320, w: int = 320, seed: int = 0,
    variant: str = "distinct",
    subtle_geom: Dict[str, float] | None = None,
) -> Dict[str, np.ndarray]:
    """Balanced corpus: dict(image (n,h,w) complex64, centers (n,2) f32,
    labels (n,) int32). Even indices class 0, odd class 1."""
    imgs, centers, labels = [], [], []
    for i in range(n):
        cls = i % 2
        ph, c = lesion_phantom_np(h, w, seed=seed + i, cls=cls,
                                  variant=variant, subtle_geom=subtle_geom)
        imgs.append(ph)
        centers.append(c)
        labels.append(cls)
    return {
        "image": np.stack(imgs),
        "centers": np.stack(centers),
        "labels": np.asarray(labels, np.int32),
    }
