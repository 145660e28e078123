"""Dissect the genuinely-failing heavy slices (PERFORMANCE.md round 2:
corpus idx 1, 11 — corrected WORSE than corrupted even against the clean
GT, while the other negative-dPSNR heavy slices were resolved as the
noisy-GT unitary-corruption artifact).

Per failing slice (and a healthy control), this probe compares, against
the CLEAN ground truth:

  corrupted | oracle-mask fit | detector-mask fit | detector fit x3 restarts

plus the detected vs true movement-group counts, to attribute the failure
to (a) klD-Net detection/grouping, (b) motion-INR init sensitivity
(rescued by best-of-K gradient-entropy restarts, eval/runners.py), or
(c) a config-level degeneracy (fails under oracle masks too).

Usage: python scripts/probe_failing_heavy.py [idx,idx,...] [n_corpus]
Defaults: slices 1,11,16 on the 50-slice seed-2024 heavy corpus (the
artifacts/e2e_round2_50slice corpus — slice identity depends on corpus
size, so n_corpus must match the artifact's).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu import weights
from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.runners import run_immoco_batched
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.train.train_kld import (
    mask_to_line_indicators,
    predict_line_mask,
)
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    idxs = [int(i) for i in (sys.argv[1] if len(sys.argv) > 1 else "1,11,16").split(",")]
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    corpus = _synthetic_corpus(n_corpus, 320, "heavy", seed=2024)
    sub = {
        k: v[np.asarray(idxs)] for k, v in corpus.items() if v is not None
    }

    kld_name = weights.best_kld_name()
    kld = weights.load_kld(kld_name)

    cfg = InstanceFitConfig(
        iters=200,
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        motion_res_factor=2,
        dc_replace=bool(int(os.environ.get("PROBE_DC", "1"))),
    )

    @jax.jit
    def score(x, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(x))[None, None],
            center_crop_quarter(jnp.abs(gt))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr])

    # True vs detected group counts.
    @jax.jit
    def det_ind(ksp):
        return mask_to_line_indicators(
            predict_line_mask(kld["net"], kld["params"], ksp[None])[0]
        )

    print("slice | true_groups det_groups | ind_agreement", flush=True)
    for j, i in enumerate(idxs):
        ksp = put_complex(sub["kspace_motion"][j])
        true_ind = jnp.asarray(sub["mask"][j][0] > 0)
        d_ind = det_ind(ksp)
        _, n_true = extract_movement_groups(true_ind, 320, 24)
        _, n_det = extract_movement_groups(d_ind, 320, 24)
        agree = float(jnp.mean((d_ind > 0) == (true_ind > 0)))
        print(
            f"{i:5d} | {int(n_true):11d} {int(n_det):10d} | {agree:.4f}",
            flush=True,
        )

    conditions = [
        ("oracle-r1", None, 1),
        ("detect-r1", kld, 1),
        ("detect-r3", kld, 3),
        ("oracle-r3", None, 3),
    ]
    results = {}
    for name, k, r in conditions:
        ms = run_immoco_batched(
            sub, cfg, kld=k, batch_size=len(idxs), segment_len=50,
            buckets=[18], restarts=r,
        )
        results[name] = ms

    hdr = "slice | corrupt(ssim/psnr_clean)"
    for name, _, _ in conditions:
        hdr += f" | {name}"
    print(hdr, flush=True)
    for j, i in enumerate(idxs):
        gt_clean = put_complex(sub["image_clean"][j])
        cs = readback(score(ifft2c(put_complex(sub["kspace_motion"][j])), gt_clean))
        row = f"{i:5d} | {float(cs[0]):.4f}/{float(cs[1]):5.2f}"
        for name, _, _ in conditions:
            m = results[name][j]
            row += f" | {m['ssim_clean']:.4f}/{m['psnr_clean']:5.2f}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
