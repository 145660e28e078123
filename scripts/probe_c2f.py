"""Coarse-to-fine fit quality probe (CPU or TPU).

Compares the baseline 200-iter fit against coarse-to-fine variants
(config.py coarse_iters/coarse_size: first K iterations against the
center-cropped k-space on a smaller raster, then full resolution) on the
synthetic light/heavy scenarios.  Reports quarter-crop SSIM/PSNR and, on
a real device, wall-clock.

Usage: python scripts/probe_c2f.py [light|heavy] [iters] [size]
Env: PROBE_C2F="60:192,100:192" comma-separated coarse_iters:coarse_size
     variants (besides the always-run baseline); PROBE_SEG segment length.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.data.synthetic import brain_phantom
from miccai24_immoco_tpu.models.immoco import build_immoco, make_segmented_fit
from miccai24_immoco_tpu.ops import ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "light"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    h = w = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    n_mov = {"light": 8, "heavy": 18}[scenario]
    max_mov = 24

    img = brain_phantom(h, w)

    @jax.jit
    def prepare(img, key):
        sim = simulate_motion_2d(key, img, n_movements=n_mov, max_movements=max_mov)
        masks, n = extract_movement_groups(sim.mask[0], h, max_mov)
        corrupted = ifft2c(sim.kspace)
        return sim.kspace, masks, n, corrupted

    @jax.jit
    def score(x, gt_img):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(x)[None, None]),
            center_crop_quarter(jnp.abs(gt_img)[None, None]),
        )
        return jnp.stack([m.ssim, m.psnr])

    ksp, masks, n, corrupted = prepare(img, jax.random.PRNGKey(0))
    s = np.asarray(score(corrupted, img))
    print(
        f"scenario={scenario} size={h} groups={int(n)} corrupted "
        f"ssim={s[0]:.4f} psnr={s[1]:.2f}",
        flush=True,
    )

    variants = [(0, 0)]
    for spec in os.environ.get("PROBE_C2F", "60:192,100:192").split(","):
        if spec:
            ci, cs = spec.split(":")
            variants.append((int(ci), int(cs)))

    seg_len = int(os.environ.get("PROBE_SEG", "20"))
    for ci, cs in variants:
        cfg = InstanceFitConfig(
            iters=iters,
            max_movements=max_mov,
            image_inr=ImageINRConfig(encoding="lattice"),
            motion_inr=MotionINRConfig(encoding="lattice"),
            motion_res_factor=2,
            coarse_iters=ci,
            coarse_size=cs,
        )
        model = build_immoco(cfg, h, w)
        fit = make_segmented_fit(model, segment_len=seg_len)
        t0 = time.perf_counter()
        r = fit(ksp, masks, jax.random.PRNGKey(1), model.statics)
        jax.block_until_ready(r.losses)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = fit(ksp, masks, jax.random.PRNGKey(1), model.statics)
        jax.block_until_ready(r.losses)
        t_run = time.perf_counter() - t0
        sf = np.asarray(score(r.image, img))
        tag = f"c2f {ci}@{cs}" if ci else "baseline"
        print(
            f"{tag}: ssim={sf[0]:.4f} psnr={sf[1]:.2f} "
            f"loss->{float(r.losses[-1]):.4f} "
            f"compile+run={t_compile:.1f}s run={t_run:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
