"""fastMRI data preparation: splits, preprocessing, frozen motion corpora.

Capability parity with reference src/utils/prepareData.py (+ data_utils
loaders), with its path bugs fixed (the reference main() pointed TRAIN/VAL/
TEST all at the train file, prepareData.py:223-225 — documented divergence):

- ``field_strength`` / ``acquisition_type``: ISMRMRD header parsing
  (prepareData.py:18-29); field strength snaps to 1.5 / 3.0 T.
- ``create_data_split``: keep PDFS files (both field strengths), random
  train/val/test selection of 200/50/51, repacked into consolidated h5
  (prepareData.py:32-112).
- ``preprocess_dataset``: per volume take slice index 1, IFFT, center-crop
  to 320^2, RSS combine (separate Re/Im — the reference quirk), re-FFT,
  skip non-320^2 (prepareData.py:115-141, data_utils.py:14-26).
- ``motion_test_data``: frozen light (6-9 movements) / heavy (16-19)
  corpora with stored masks + corruption-baseline metrics
  (prepareData.py:144-216).

Storage: npz archives (not torch pickles) — portable and dependency-free.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import DataConfig, MotionSimConfig
from miccai24_immoco_tpu.ops.complex_utils import rss_complex
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.utils.hostio import get_complex, put_complex


# Conventional fastMRI mount points probed by detect_fastmri_mount();
# override/extend with IMMOCO_FASTMRI_ROOT.
DEFAULT_MOUNTS = (
    "/data/fastmri",
    "/mnt/fastmri",
    "/root/data/fastmri",
    "Dataset/FastMRI/t2",
)


def detect_fastmri_mount() -> Optional[str]:
    """First existing fastMRI root (dir containing train/ val/ test/ of .h5
    volumes): $IMMOCO_FASTMRI_ROOT, then conventional mount points.

    Exists so a real fastMRI mount is a config change, not new code: the day
    a corpus appears, ``cli prepare-data`` (no --src) and the eval commands
    (via $IMMOCO_CORPUS_DIR) pick it up.
    """
    env = os.environ.get("IMMOCO_FASTMRI_ROOT")
    for cand in ([env] if env else []) + list(DEFAULT_MOUNTS):
        if cand and all(
            os.path.isdir(os.path.join(cand, s))
            for s in ("train", "val", "test")
        ):
            return cand
    return None


def field_strength(h5_file) -> float:
    """Parse systemFieldStrength_T from the ISMRMRD header; snap to 1.5/3.0
    (reference getFieldStrength, prepareData.py:18-25)."""
    hdr = str(h5_file["ismrmrd_header"][()])
    match = re.findall(
        r"<systemFieldStrength_T>(\d\.?\d*)</systemFieldStrength_T>", hdr
    )[0]
    return 1.5 if float(match) < 2.0 else 3.0


def acquisition_type(h5_file) -> str:
    """'PD' for CORPD_FBK else 'PDFS' (prepareData.py:28-29)."""
    return "PD" if h5_file.attrs.get("acquisition") == "CORPD_FBK" else "PDFS"


def select_pdfs_files(dir_path: str) -> List[str]:
    """Filenames in dir_path whose headers mark them PDFS (either field)."""
    import h5py

    keep = []
    for fname in sorted(os.listdir(dir_path)):
        if not fname.endswith(".h5"):
            continue
        with h5py.File(os.path.join(dir_path, fname), "r") as hf:
            if acquisition_type(hf) == "PDFS":
                field_strength(hf)  # raises if header malformed
                keep.append(fname)
    return keep


def create_data_split(
    src_root: str,
    dst_root: str,
    counts: Tuple[int, int, int] = (200, 50, 51),
    seed: int = 0,
) -> Dict[str, str]:
    """Consolidate per-split PDFS volumes into one h5 per split.

    src_root must contain train/ val/ test/ subdirs of fastMRI .h5 volumes.
    Returns {"train": path, "val": path, "test": path}.
    """
    import h5py

    rng = np.random.default_rng(seed)
    out = {}
    for split, count in zip(("train", "val", "test"), counts):
        src = os.path.join(src_root, split)
        files = select_pdfs_files(src)
        if len(files) > count:
            files = list(rng.choice(files, count, replace=False))
        dst_dir = os.path.join(dst_root, f"{split}_files")
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f"_{split}_data.h5")
        with h5py.File(dst, "w") as f:
            for fname in files:
                with h5py.File(os.path.join(src, fname), "r") as hf:
                    f.create_dataset(fname, data=hf["kspace"][:])
        out[split] = dst
    return out


import functools


@functools.partial(jax.jit, static_argnums=1)
def _prepare_slice(kspace_coils: jnp.ndarray, crop: int = 320):
    """(C, H, W) multi-coil k-space -> (crop, crop) combined k-space + image.

    IFFT -> center crop -> RSS (separate Re/Im, data_utils.py:60-75) -> FFT
    (data_utils.py:14-26).
    """
    img = ifft2c(kspace_coils)
    h, w = img.shape[-2:]
    cy = h // 2 - crop // 2
    cx = w // 2 - crop // 2
    img = jax.lax.dynamic_slice(
        img, (0, cy, cx), (img.shape[0], crop, crop)
    )
    combined = rss_complex(img, axis=0)
    return fft2c(combined), combined


def prepare_slice(kspace_coils: np.ndarray, crop: int = 320):
    """Host API: numpy multi-coil slice -> (kspace, image_rss) on device."""
    return _prepare_slice(put_complex(kspace_coils), crop)


def preprocess_dataset(
    consolidated_h5: str,
    out_npz: Optional[str] = None,
    slice_index: int = 1,
    crop: int = 320,
) -> np.ndarray:
    """Per volume: take slice `slice_index`, combine, keep 320^2 only.

    Returns (N, crop, crop) complex64 host array; optionally saves npz with
    key 'kspace' (Re/Im stacked for portability).
    """
    import h5py

    kspaces = []
    with h5py.File(consolidated_h5, "r") as f:
        for name in sorted(f.keys()):
            vol = f[name][()]
            if vol.shape[0] <= slice_index:
                continue
            ks, _ = prepare_slice(vol[slice_index], crop)
            if ks.shape != (crop, crop):
                continue
            kspaces.append(get_complex(ks))
    stack = np.stack(kspaces).astype(np.complex64)
    if out_npz:
        np.savez_compressed(
            out_npz, kspace=np.stack([stack.real, stack.imag], -1)
        )
    return stack


def load_kspace_npz(path: str) -> np.ndarray:
    pair = np.load(path)["kspace"]
    return (pair[..., 0] + 1j * pair[..., 1]).astype(np.complex64)


def motion_test_data(
    consolidated_h5: str,
    out_dir: str,
    cfg: DataConfig = DataConfig(),
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    seed: int = 0,
    max_movements: int = 24,
    slice_index: int = 0,
) -> Dict[str, dict]:
    """Frozen light/heavy test corpora with corruption-baseline metrics.

    Mirrors prepareData.py:144-216 (which uses volume slice [0] here, unlike
    preprocess_dataset's [1]).  Saves one npz per scenario with keys:
    kspace_motion (.., 2 Re/Im), image_rss (.., 2), mask, rotations,
    translations, and per-slice corruption metrics as a JSON string.
    """
    import json as _json

    import h5py

    scenarios = {
        "light": np.arange(*cfg.light_movements),
        "heavy": np.arange(*cfg.heavy_movements),
    }
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    results = {}

    @jax.jit
    def corrupt(kspace, key, n_mov):
        image = ifft2c(kspace)
        return simulate_motion_2d(
            key, image, n_movements=n_mov, cfg=sim_cfg, max_movements=max_movements
        )

    @jax.jit
    def corruption_metrics(kspace_motion, image_rss):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(ifft2c(kspace_motion)))[None, None],
            center_crop_quarter(jnp.abs(image_rss))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr, m.haarpsi, m.rmse])

    with h5py.File(consolidated_h5, "r") as f:
        names = sorted(f.keys())
        for scenario, movements in scenarios.items():
            ks_list, img_list, mask_list, rot_list, tr_list, metrics = (
                [], [], [], [], [], []
            )
            for i, name in enumerate(names):
                vol = f[name][()]
                if vol.shape[0] <= slice_index:
                    continue
                ks, img = prepare_slice(vol[slice_index], cfg.crop_size)
                if ks.shape != (cfg.crop_size, cfg.crop_size):
                    continue
                n_mov = int(rng.choice(movements))
                key = jax.random.PRNGKey(seed * 100003 + i)
                sample = corrupt(ks, key, n_mov)
                vals = np.asarray(corruption_metrics(sample.kspace, img))
                metrics.append(
                    dict(zip(("ssim", "psnr", "haar_psi", "rmse"),
                             map(float, vals)))
                )
                ks_list.append(get_complex(sample.kspace))
                img_list.append(get_complex(img))
                mask_list.append(np.asarray(sample.mask))
                rot_list.append(np.asarray(sample.rotations))
                tr_list.append(np.asarray(sample.translations))

            path = os.path.join(out_dir, f"_test_data_{scenario}.npz")
            ksm = np.stack(ks_list)
            imr = np.stack(img_list)
            np.savez_compressed(
                path,
                kspace_motion=np.stack([ksm.real, ksm.imag], -1),
                image_rss=np.stack([imr.real, imr.imag], -1),
                mask=np.stack(mask_list),
                rotations=np.stack(rot_list),
                translations=np.stack(tr_list),
                metrics_json=np.frombuffer(
                    _json.dumps(metrics).encode(), dtype=np.uint8
                ),
            )
            results[scenario] = {"path": path, "metrics": metrics}
    return results


def load_test_corpus(path: str) -> dict:
    import json as _json

    z = np.load(path)
    ksm = z["kspace_motion"]
    imr = z["image_rss"]
    return {
        "kspace_motion": (ksm[..., 0] + 1j * ksm[..., 1]).astype(np.complex64),
        "image_rss": (imr[..., 0] + 1j * imr[..., 1]).astype(np.complex64),
        "mask": z["mask"],
        "rotations": z["rotations"],
        "translations": z["translations"],
        "metrics": _json.loads(bytes(z["metrics_json"]).decode()),
    }
