"""Measure the instance fit's pure RECONSTRUCTION ceiling.

probe_heavy_failures.py showed the failing heavy slices have (a) perfect
detection and (b) mildly-damaged corrupted images (slice 1: 30.6 dB vs the
clean GT).  Hypothesis: the INR+GE-prior fit has an intrinsic
reconstruction-fidelity ceiling (~26 dB at 200 iters) independent of
motion, so any slice whose corruption is milder than the ceiling gets
WORSE after "correction".

Protocol: fit each slice's UNCORRUPTED k-space (zero corrupted-line
indicator -> no movement groups) with the artifact config and report PSNR
vs the noisy and clean GTs — the motion-free upper bound of the method.

Usage: python scripts/probe_recon_ceiling.py [idx,...] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.runners import run_immoco_batched
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.utils.hostio import get_complex, put_complex


def main():
    idx = ([int(i) for i in sys.argv[1].split(",")]
           if len(sys.argv) > 1 else [1, 4, 25, 0])
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n = max(idx) + 1
    corpus = _synthetic_corpus(n, 320, "heavy", seed=2024)
    sub = {k: np.asarray(v)[idx] for k, v in corpus.items()}
    # Replace the corrupted k-space with the pristine transform of the GT
    # and zero the corrupted-line indicator: a motion-free fit.
    clean_ksp = get_complex(fft2c(put_complex(sub["image_rss"])))
    sub["kspace_motion"] = np.asarray(clean_ksp)
    sub["mask"] = np.zeros_like(sub["mask"])

    cfg = InstanceFitConfig(
        iters=iters,
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        # dc off: with a zero indicator dc_replace would copy every measured
        # column and trivially return the input; we want the INR's own
        # synthesis fidelity.
        dc_replace=bool(int(os.environ.get("PROBE_DC", "0"))),
        motion_res_factor=2,
    )
    m = run_immoco_batched(sub, cfg, kld=None, batch_size=4,
                           segment_len=50, buckets=[18])
    print(f"== motion-free fit ceiling (iters={iters}, "
          f"dc={cfg.dc_replace}) ==")
    for j, i in enumerate(idx):
        r = m[j]
        print(f"{i:>5}  psnr {r['psnr']:6.2f}  psnr_clean"
              f" {r['psnr_clean']:6.2f}  ssim {r['ssim']:.4f}"
              f"  haar {r['haar_psi']:.4f}")


if __name__ == "__main__":
    main()
