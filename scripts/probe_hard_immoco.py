"""Probe: IM-MoCo fit quality vs hard-scenario severity.

The first 50-slice hard e2e (rot/shift +-15, w4-20, noise-free) REGRESSED
vs corrupted (0.774 vs 0.822): +-15 motions push displacements past what
the capped Motion INR (motion_disp_px=30, the pallas_tiled bound) can
represent.  This probes the heavy-recipe fit on candidate severities to
find the hardest corpus the production fit still corrects.

Usage: python scripts/probe_hard_immoco.py [n=8] [candidates=F,G,H]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
    MotionSimConfig,
)

CANDIDATES = {
    # name -> (n_movements, MotionSimConfig); all noise-free
    "F": (22, MotionSimConfig(width_range=(8, 24))),            # ~0.854
    "G": (18, MotionSimConfig(shift_range=(-12, 12),
                              rotate_range=(-12, 12),
                              width_range=(4, 20))),            # ?
    "H": (18, MotionSimConfig(shift_range=(-15, 15),
                              rotate_range=(-15, 15),
                              width_range=(4, 20))),            # the failed one
    # Controls after F/G both regressed: F showed the fit collapses when
    # wide bands leave ~no uncorrupted k-space anchor (22 x 8-24-wide bands
    # cover ~all 320 columns; the forward model's (1 - sum(masks)) term is
    # ~empty), INDEPENDENT of motion amplitude.  J isolates the noise-free
    # variable (heavy bands + heavy motion, noise-free); I adds +-12 motion.
    "I": (18, MotionSimConfig(shift_range=(-12, 12),
                              rotate_range=(-12, 12))),         # w1-10
    "J": (18, MotionSimConfig()),                               # heavy, NF
    # T = the committed hard scenario: heavy sim on the textured phantom.
    "T": (18, MotionSimConfig()),
}
TEXTURES = {"T": 0.15}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = (sys.argv[2] if len(sys.argv) > 2 else "F,G").split(",")

    from miccai24_immoco_tpu import weights
    from miccai24_immoco_tpu.eval.harness import aggregate
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched
    from scripts.probe_hard_regime import corpus_for

    kld = weights.load_kld(weights.best_kld_name())
    # HI_WARP=matmul HI_CAP=50: the hard-scenario recipe candidate — the
    # dense one-hot matmul warp is exact for ANY displacement (the
    # reference allows the full range), lifting the pallas_tiled 30 px
    # bound that breaks the fit at rot/shift +-12..15.  freeze_tile 64
    # keeps the frozen tail valid for caps up to 63.
    warp = os.environ.get("HI_WARP", "pallas_tiled")
    cap = float(os.environ.get("HI_CAP", "30"))
    cfg = InstanceFitConfig(
        iters=int(os.environ.get("HI_ITERS", "150")),
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=cap,
        warp_impl=warp,
        motion_freeze_tile_px=64 if cap > 31 else 32,
        compute_dtype="bfloat16",
        motion_res_factor=4,
        coarse_iters=38,
        coarse_size=256,
        motion_freeze_iters=34,
        motion_duty=(10, 10),
    )
    summary = {}
    for name in names:
        nmov, sim_cfg = CANDIDATES[name]
        corpus = corpus_for(n, 320, nmov, sim_cfg, noise=False,
                            texture=TEXTURES.get(name, 0.0))
        from miccai24_immoco_tpu.ops.fft import ifft2c
        from miccai24_immoco_tpu.ops.metrics import (
            calmetric2d,
            center_crop_quarter,
        )
        from miccai24_immoco_tpu.utils.hostio import put_complex, readback

        @jax.jit
        def _corr(ksp_b, gt_b):
            def one(ksp, gt):
                m = calmetric2d(
                    center_crop_quarter(jnp.abs(ifft2c(ksp)))[None, None],
                    center_crop_quarter(jnp.abs(gt))[None, None],
                )
                return jnp.stack([m.ssim, m.psnr])

            return jax.vmap(one)(ksp_b, gt_b)

        cv = readback(_corr(put_complex(corpus["kspace_motion"]),
                            put_complex(corpus["image_rss"])))
        fit = run_immoco_batched(
            corpus, cfg, kld=kld, limit=n, batch_size=min(n, 4),
            segment_len=50, buckets=[18],
        )
        agg = aggregate(fit)
        summary[name] = {
            "corrupted_ssim": round(float(cv[:, 0].mean()), 4),
            "corrupted_psnr": round(float(cv[:, 1].mean()), 2),
            "immoco_ssim": round(agg["ssim"]["mean"], 4),
            "immoco_psnr": round(agg["psnr"]["mean"], 2),
        }
        print(name, json.dumps(summary[name]), flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
