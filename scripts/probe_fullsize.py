"""Full-size (320x320) IM-MoCo probe on the real TPU.

Simulates the reference's light/heavy scenarios on a synthetic brain phantom,
runs the instance fit with reference-scale INR capacity for both encoding
backends, and reports quarter-crop SSIM/PSNR vs the corrupted input plus
wall-clock. Usage: python scripts/probe_fullsize.py [light|heavy] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import build_immoco, make_instance_fit
from miccai24_immoco_tpu.ops import ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d


def synthetic_brain(h=320, w=320, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    # Skull-ish ring + soft tissue blobs + fine texture.
    cy, cx = h / 2, w / 2
    r = np.sqrt(((yy - cy) / (0.42 * h)) ** 2 + ((xx - cx) / (0.36 * w)) ** 2)
    img += np.clip(1.2 * np.exp(-((r - 0.92) ** 2) / 0.004), 0, None)
    img += 0.8 * (r < 0.88)
    for _ in range(24):
        ccy, ccx = rng.uniform(0.3, 0.7, 2) * [h, w]
        ry, rx = rng.uniform(0.02, 0.12, 2) * [h, w]
        img += rng.uniform(-0.35, 0.5) * np.exp(
            -(((yy - ccy) / ry) ** 2 + ((xx - ccx) / rx) ** 2)
        )
    img += 0.05 * rng.standard_normal((h, w)).astype(np.float32)
    img = np.clip(img, 0, None)
    phase = 0.4 * np.sin(yy / 23.0) * np.cos(xx / 17.0)
    from miccai24_immoco_tpu.utils.hostio import put_complex

    return put_complex((img * np.exp(1j * phase)).astype(np.complex64))


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "light"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_mov = {"light": 8, "heavy": 18}[scenario]
    max_mov = 24

    h = w = 320
    img = synthetic_brain(h, w)
    gt = jnp.abs(img)[None, None]

    def score(x):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(x)[None, None]), center_crop_quarter(gt)
        )
        return float(m.ssim), float(m.psnr)

    sim = simulate_motion_2d(
        jax.random.PRNGKey(0), img, n_movements=n_mov, max_movements=max_mov
    )
    masks, n = extract_movement_groups(sim.mask[0], h, max_mov)
    print(
        f"scenario={scenario} groups={int(n)} corrupted_cols={int(sim.mask[0].sum())}"
    )
    print("corrupted:", score(ifft2c(sim.kspace)))

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
        fit = jax.jit(make_instance_fit(model))
        t0 = time.perf_counter()
        r = fit(sim.kspace, masks, jax.random.PRNGKey(1))
        r.image.block_until_ready()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = fit(sim.kspace, masks, jax.random.PRNGKey(1))
        r.image.block_until_ready()
        t_run = time.perf_counter() - t0
        s = score(r.image)
        print(
            f"{img_enc}/{mot_enc}: ssim/psnr={s} "
            f"loss {float(r.losses[0]):.1f}->{float(r.losses[-1]):.3f} "
            f"compile={t_compile:.1f}s run={t_run:.2f}s"
        )


if __name__ == "__main__":
    main()
