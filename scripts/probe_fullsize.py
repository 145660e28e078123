"""Full-size (320x320) IM-MoCo probe on the real TPU.

Simulates the reference's light/heavy scenarios on a synthetic brain phantom,
runs the instance fit with reference-scale INR capacity, and reports
quarter-crop SSIM/PSNR vs the corrupted input plus wall-clock.

Everything is wrapped in as few jitted functions as possible: on the remote-
compile TPU runtime each *eager* primitive pays a full compile round-trip,
so scripts must be jit-first.

Usage: python scripts/probe_fullsize.py [light|heavy] [iters] [img_enc/mot_enc]
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
    n_mov = {"light": 8, "heavy": 18}[scenario]
    max_mov = 24
    h = w = 320

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

    t0 = time.perf_counter()
    ksp, masks, n, corrupted = prepare(img, jax.random.PRNGKey(0))
    s = np.asarray(score(corrupted, img))
    print(
        f"scenario={scenario} groups={int(n)} corrupted ssim={s[0]:.4f} "
        f"psnr={s[1]:.2f} (prep {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )

    variants = [("lattice", "lattice"), ("hash", "lattice"), ("hash", "hash")]
    if len(sys.argv) > 3:
        img_e, mot_e = sys.argv[3].split("/")
        variants = [(img_e, mot_e)]
    for img_enc, mot_enc in variants:
        cfg = InstanceFitConfig(
            iters=iters,
            max_movements=max_mov,
            image_inr=ImageINRConfig(encoding=img_enc),
            motion_inr=MotionINRConfig(encoding=mot_enc),
        )
        model = build_immoco(cfg, h, w)
        seg_len = int(os.environ.get("PROBE_SEG", "20"))
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
        print(
            f"{img_enc}/{mot_enc}: ssim={sf[0]:.4f} psnr={sf[1]:.2f} "
            f"loss {float(r.losses[0]):.1f}->{float(r.losses[-1]):.3f} "
            f"compile+run={t_compile:.1f}s run={t_run:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
