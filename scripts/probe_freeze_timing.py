"""Joint vs motion-frozen segment timing on TPU (cfg.motion_freeze_iters).

Times the batched joint full-res segment against the frozen segment at two
segment lengths (the difference cancels the fixed ~390 ms per-program
tunnel cost — PERFORMANCE.md cost model) in the bench configuration, to
locate why BENCH_FREEZE showed no wall-clock win.

Usage: python scripts/probe_freeze_timing.py [M=10] [batch=4]
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
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    fit_schedule,
    make_segmented_fit,
)
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.utils.hostio import sync


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    h = w = 320
    cfg = InstanceFitConfig(
        iters=200,
        max_movements=m,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        motion_res_factor=4,
        motion_freeze_iters=50,
    )
    model = build_immoco(cfg, h, w)
    run = make_segmented_fit(model, segment_len=50)

    images = phantom_stack(b, h, w, seed=0)
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    @jax.jit
    def prep(images, keys):
        def one(img, k):
            sim = simulate_motion_2d(k, img, n_movements=min(8, m),
                                     max_movements=m)
            masks, _ = extract_movement_groups(sim.mask[0], h, m)
            return sim.kspace, masks

        return jax.vmap(one)(images, keys)

    ksp, masks = prep(images, keys)
    vinit = jax.jit(jax.vmap(run.init_fn, in_axes=(0, 0, None)))
    params, opt, k_in, _ = vinit(ksp, keys, model.statics)
    sched = fit_schedule(cfg)

    variants = {
        "joint": jax.jit(jax.vmap(run.segment_fn,
                                  in_axes=(0, 0, 0, 0, None, None))),
        "frozen": jax.jit(jax.vmap(run.frozen_segment_fn,
                                   in_axes=(0, 0, 0, 0, None, None))),
    }
    for name, fn in variants.items():
        for seg_len in (10, 50):
            seg = jnp.asarray(sched[:seg_len])
            out = fn(params, opt, k_in, masks, seg, model.statics)
            sync(out[1])  # warm/compile
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(params, opt, k_in, masks, seg, model.statics)
                sync(out[1])
            dt = (time.perf_counter() - t0) / reps
            print(f"{name} seg{seg_len}: {dt*1e3:.1f} ms")
            if seg_len == 10:
                t10 = dt
        per_iter = (dt - t10) / (50 - 10) * 1e3
        print(f"{name}: {per_iter:.2f} ms/iter (batch {b}, M={m})")


if __name__ == "__main__":
    main()
