"""Measure identity-column recentering (config.recenter_max_px /
ops/recenter.py) on the heavy-protocol failing slices.

Round-2 attribution: the worst heavy-protocol regressions are slices
whose corrupted bands own the k-space CENTER (7 of the worst 12 have
>77% of clean-spectrum energy inside corrupted columns); their fits
land in the degenerate common-mode-shift basin (uniform ~7 px fitted
displacement on every group).  This probe fits those slices with the
protocol config, recenter OFF vs ON, and reports ssim/psnr vs the
clean GT plus the fitted mean displacement.

Usage: python scripts/probe_recenter.py [idx,...] [n_corpus] [max_px]
Defaults: slices 1,4,25,12,16,0 on the 50-slice seed-2024 heavy corpus
(1/4/25/12 = worst DC-corrupted; 16 = hurt but NOT DC-corrupted — the
recentering should be ~neutral there; 0 = healthy control), gate 30 px.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import dataclasses
import json

from miccai24_immoco_tpu import weights
from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.runners import run_immoco_batched


def main():
    idxs = [
        int(i)
        for i in (sys.argv[1] if len(sys.argv) > 1 else "1,4,25,12,16,0").split(",")
    ]
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    max_px = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

    corpus = _synthetic_corpus(n_corpus, 320, "heavy", seed=2024)
    sub = {k: v[np.asarray(idxs)] for k, v in corpus.items() if v is not None}
    kld = weights.load_kld(weights.best_kld_name())

    base = InstanceFitConfig(
        iters=200,
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        motion_res_factor=2,
        dc_replace=True,
    )

    out = {}
    for name, cfg in (
        ("off", base),
        ("on", dataclasses.replace(base, recenter_max_px=max_px)),
    ):
        metrics, diags = run_immoco_batched(
            sub, cfg, kld=kld, batch_size=len(idxs), segment_len=50,
            buckets=[18], return_diagnostics=True,
        )
        out[name] = (metrics, diags)
        print(f"== recenter {name} ==", flush=True)
        for j, i in enumerate(idxs):
            m, d = metrics[j], diags[j]
            print(
                f"  slice {i:3d}: ssim_clean {m['ssim_clean']:.4f} "
                f"psnr_clean {m['psnr_clean']:6.2f} "
                f"disp_px {d.get('mean_disp_px', float('nan')):5.2f}",
                flush=True,
            )

    summary = {
        str(i): {
            name: {
                "ssim_clean": out[name][0][j]["ssim_clean"],
                "psnr_clean": out[name][0][j]["psnr_clean"],
            }
            for name in ("off", "on")
        }
        for j, i in enumerate(idxs)
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
