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


def lesion_phantom_np(
    h: int = 320, w: int = 320, seed: int = 0, cls: int = 0,
    variant: str = "distinct",
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
      ring-enhancing rim of the same extent.  The rim is a fine
      high-frequency cue that motion ghosting destroys, reproducing the
      reference protocol's *condition gap* (test_classification.py:65-100:
      accuracy drops under corruption, recovers under correction) on
      synthetic data.
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
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(0.15, 0.55)
        ly = cy + rad * ry_ax * np.sin(ang)
        lx = cx + rad * rx_ax * np.cos(ang)
        amp = rng.uniform(0.45, 0.6)
        d2 = (yy - ly) ** 2 + (xx - lx) ** 2
        if cls == 0:
            # Solid blob: Gaussian disc, sigma ~4.5 px.
            img += amp * np.exp(-d2 / 4.5**2)
        else:
            # Ring-enhancing rim: thin (sigma 1.8 px) shell at radius 7 px —
            # same footprint and brightness as the blob; only the internal
            # fine structure differs.
            img += amp * np.exp(-((np.sqrt(d2) - 7.0) ** 2) / 1.8**2)
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
) -> Dict[str, np.ndarray]:
    """Balanced corpus: dict(image (n,h,w) complex64, centers (n,2) f32,
    labels (n,) int32). Even indices class 0, odd class 1."""
    imgs, centers, labels = [], [], []
    for i in range(n):
        cls = i % 2
        ph, c = lesion_phantom_np(h, w, seed=seed + i, cls=cls,
                                  variant=variant)
        imgs.append(ph)
        centers.append(c)
        labels.append(cls)
    return {
        "image": np.stack(imgs),
        "centers": np.stack(centers),
        "labels": np.asarray(labels, np.int32),
    }
