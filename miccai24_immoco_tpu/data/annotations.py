"""fastMRI+ annotation processing: bounding boxes -> lesion patches.

Capability parity with reference src/utils/classification_utils.py:

- parse the fastMRI+ brain CSV (header file,slice,study_level,x,y,width,
  height,label — Annotations/brain.csv)
- keep the two classes the reference trains on: labels with > 1000
  instances minus "Posttreatment change", i.e.
  "Nonspecific white matter lesion" -> 0, "Craniotomy" -> 1
  (classification_utils.py:31-39)
- extract 124x124 patches around box centers via the affine-grid scale-0.2
  sampling trick of classification_utils.py:241-262 (an affine_grid with
  scale 0.2 on a 620^2-normalized frame samples a 124^2 window)
- emit (patches, labels, label_weights) arrays

The 80/20/50-test file-level splitting helper mirrors
classification_utils.py:155-234's intent without the YOLO txt detour.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample

CLASS_MAP = {"Nonspecific white matter lesion": 0, "Craniotomy": 1}
PATCH = 124


def read_annotations(csv_path: str) -> List[dict]:
    """Rows with keys file, slice, x, y, width, height, label (typed)."""
    rows = []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            if not row.get("label"):
                continue
            try:
                rows.append(
                    {
                        "file": row["file"],
                        "slice": int(row["slice"]),
                        "x": float(row["x"]),
                        "y": float(row["y"]),
                        "width": float(row["width"]),
                        "height": float(row["height"]),
                        "label": row["label"],
                    }
                )
            except (ValueError, KeyError):
                continue
    return rows


def filter_classes(
    rows: Sequence[dict],
    min_instances: int = 1000,
    exclude: Tuple[str, ...] = ("Posttreatment change",),
    class_map: Optional[Dict[str, int]] = None,
) -> Tuple[List[dict], Dict[str, int]]:
    """Keep rows of sufficiently frequent classes (reference filter,
    classification_utils.py:31-39). Returns (rows, label -> id)."""
    counts = defaultdict(int)
    for r in rows:
        counts[r["label"]] += 1
    if class_map is None:
        names = sorted(
            [
                k
                for k, c in counts.items()
                if c > min_instances and k not in exclude
            ]
        )
        class_map = {k: i for i, k in enumerate(names)}
    kept = [dict(r, class_id=class_map[r["label"]]) for r in rows
            if r["label"] in class_map]
    return kept, class_map


def split_by_file(
    rows: Sequence[dict], seed: int = 0, test_files: int = 50,
    train_frac: float = 0.8
) -> Dict[str, List[dict]]:
    """File-level train/val/test split (test = fixed file count, remainder
    80/20), mirroring classification_utils.py:155-234."""
    rng = np.random.default_rng(seed)
    files = sorted({r["file"] for r in rows})
    rng.shuffle(files)
    test = set(files[:test_files])
    rest = files[test_files:]
    n_train = int(len(rest) * train_frac)
    train = set(rest[:n_train])
    val = set(rest[n_train:])
    out = {"train": [], "val": [], "test": []}
    for r in rows:
        split = "test" if r["file"] in test else (
            "train" if r["file"] in train else "val"
        )
        out[split].append(r)
    return out


def extract_patch(
    image: jnp.ndarray, cx: float, cy: float, patch: int = PATCH
) -> jnp.ndarray:
    """124^2 patch around (cx, cy) via the reference's affine-grid sampling
    (classification_utils.py:241-262): scale = patch / (H * 2) relative to
    a double-size normalized frame, translation to the box center."""
    h, w = image.shape
    scale = patch / float(h)
    # Normalized center offset in [-1, 1] (align_corners=True frame).
    tx = (2.0 * cx / (w - 1)) - 1.0
    ty = (2.0 * cy / (h - 1)) - 1.0
    theta = jnp.asarray(
        [[scale, 0.0, tx], [0.0, scale, ty]], jnp.float32
    )
    grid = affine_grid(theta, (patch, patch), align_corners=True)
    return grid_sample(
        image[None], grid, mode="bilinear", padding_mode="border",
        align_corners=True,
    )[0]


def write_yolo_labels(
    rows: Sequence[dict], out_dir: str, image_hw: Tuple[int, int]
) -> None:
    """YOLO-format txt files per (file, slice): 'class cx cy w h' normalized
    to [0, 1] (the detection-data layout of classification_utils.py:42-67)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    h, w = image_hw
    grouped: Dict[Tuple[str, int], List[dict]] = defaultdict(list)
    for r in rows:
        grouped[(r["file"], r["slice"])].append(r)
    for (fname, sl), rs in grouped.items():
        stem = f"{fname.replace('.h5', '')}_{sl}"
        with open(os.path.join(out_dir, stem + ".txt"), "w") as f:
            for r in rs:
                cx = (r["x"] + r["width"] / 2.0) / w
                cy = (r["y"] + r["height"] / 2.0) / h
                f.write(
                    f"{r['class_id']} {cx:.6f} {cy:.6f} "
                    f"{r['width'] / w:.6f} {r['height'] / h:.6f}\n"
                )


def read_yolo_labels(path: str) -> np.ndarray:
    """YOLO txt -> (N, 2) normalized centers in [-1, 1] (the convention
    test_immoco_downstream.py:225-236 feeds to patch extraction)."""
    centers = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 5:
                continue
            _, cx, cy, _, _ = map(float, parts[:5])
            centers.append([cx * 2.0 - 1.0, cy * 2.0 - 1.0])
    return np.asarray(centers, np.float32)


def build_patch_dataset(
    rows: Sequence[dict],
    image_lookup,
    patch: int = PATCH,
    num_classes: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """rows + (file, slice) -> image resolver -> (patches, labels, weights).

    image_lookup(file, slice) returns a (H, W) float array or None to skip.
    Label weights are inverse-frequency (the reference's label_weight).
    """
    patches, labels = [], []
    for r in rows:
        img = image_lookup(r["file"], r["slice"])
        if img is None:
            continue
        cx = r["x"] + r["width"] / 2.0
        cy = r["y"] + r["height"] / 2.0
        patches.append(
            np.asarray(extract_patch(jnp.asarray(img, jnp.float32), cx, cy, patch))
        )
        labels.append(r["class_id"])
    patches_np = np.stack(patches) if patches else np.zeros((0, patch, patch))
    labels_np = np.asarray(labels, np.int32)
    counts = np.bincount(labels_np, minlength=num_classes).astype(np.float32)
    weights = counts.sum() / (num_classes * np.maximum(counts, 1.0))
    return patches_np, labels_np, weights
