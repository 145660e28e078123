"""Does heavy motion duty-cycling (config.motion_duty) hurt the failing
tail slices?  The duty 10x10 recipe wins +0.47 dB corpus-PSNR on the
50-slice heavy protocol (artifacts/e2e_round2b_50slice), but slice 1
recorded -5.3 dpsnr_clean there vs -1.6 in a no-duty probe — confounded
by different batch keys.  This probe fits tail + control slices with
identical keys, duty on vs off, isolating the recipe effect.

Usage: python scripts/probe_duty_tail.py [idx,...] [n_corpus]
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
        for i in (sys.argv[1] if len(sys.argv) > 1 else "1,4,25,31,16,0").split(",")
    ]
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 50

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

    summary = {}
    for name, cfg in (
        ("no_duty", base),
        ("duty_10x10", dataclasses.replace(base, motion_duty=(10, 10))),
    ):
        metrics, diags = run_immoco_batched(
            sub, cfg, kld=kld, batch_size=min(4, len(idxs)), segment_len=50,
            buckets=[18], return_diagnostics=True,
        )
        print(f"== {name} ==", flush=True)
        for j, i in enumerate(idxs):
            m, d = metrics[j], diags[j]
            print(
                f"  slice {i:3d}: ssim_clean {m['ssim_clean']:.4f} "
                f"psnr_clean {m['psnr_clean']:6.2f} "
                f"disp_px {d.get('mean_disp_px', float('nan')):5.2f}",
                flush=True,
            )
            summary.setdefault(str(i), {})[name] = {
                "ssim_clean": m["ssim_clean"],
                "psnr_clean": m["psnr_clean"],
            }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
