"""Benchmark: IM-MoCo per-slice instance-fit wall-clock on real TPU hardware.

Protocol (BASELINE.md): the reference measurement is the 200-iteration
self-supervised fit per 320x320 fastMRI T2 brain slice (reference
test_immoco.py:65-72).  The reference never measures wall-clock; the
comparison number used for ``vs_baseline`` is a *documented estimate* of the
A100 PyTorch+tiny-cuda-nn reference at 4.0 s/slice (200 iters x ~20 ms of
~10 kernel launches incl. 2 tcnn nets, up-to-24-way grid_sample and 25 FFTs
per iter) — conservative in the reference's favor; replace with a measured
number when an A100 is available.

We report the *effective per-slice latency* of a vmapped batch (batch
throughput is the production deployment mode; the whole 200-iter fit is one
XLA graph), plus fitted-image SSIM vs ground truth on a synthetic corpus to
guard against benchmarking a broken model.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Env knobs: BENCH_BATCH (default 4), BENCH_ITERS (115), BENCH_SIZE (320),
BENCH_ENCODING (image encoding: lattice|hash, default lattice).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

A100_REFERENCE_SECONDS_PER_SLICE = 4.0  # documented estimate, see docstring


def _c2f_env():
    """Coarse-to-fine knobs: BENCH_C2F is either a single phase length (run
    at BENCH_CSIZE^2) or a '+'-separated multi-level pyramid like
    '40@192+50@256' (config.py coarse_schedule).  0 disables."""
    c2f = os.environ.get("BENCH_C2F", "12@192+24@256")
    if "@" in c2f:
        sched = tuple(
            (int(p.split("@")[0]), int(p.split("@")[1]))
            for p in c2f.split("+")
        )
        return {"coarse_schedule": sched}
    return {
        "coarse_iters": int(c2f),
        "coarse_size": int(os.environ.get("BENCH_CSIZE", "256")),
    }


def main():
    from miccai24_immoco_tpu.config import (
        ImageINRConfig,
        InstanceFitConfig,
        MotionINRConfig,
    )
    from miccai24_immoco_tpu.data.synthetic import phantom_stack
    from miccai24_immoco_tpu.models.immoco import build_immoco
    from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups
    from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
    from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_segmented_fit

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    # Default 115 (round 3 cont.): the lambda schedule scales with iters, so
    # a shorter fit is a rescaled protocol, not a truncation; the measured
    # quality cliff is the ~54 full-res JOINT iterations, which the default
    # c2f/freeze split preserves (PERFORMANCE.md round-3 table: 115 it at
    # 0.9308 s/slice, ssim 0.9861/psnr 35.32 vs the 120-it 0.9549/0.9862
    # and the 200-it round-2 default 1.78 s/slice, 0.9864/34.47).
    # BENCH_ITERS=200 + BENCH_C2F=30@192+45@256 + BENCH_FREEZE=60 +
    # BENCH_FITMOV=10 reproduces the round-2 protocol.
    iters = int(os.environ.get("BENCH_ITERS", "115"))
    size = int(os.environ.get("BENCH_SIZE", "320"))
    enc = os.environ.get("BENCH_ENCODING", "lattice")
    max_mov = int(os.environ.get("BENCH_MAXMOV", "10"))
    # light protocol: 8 movements; 10 covers every light slice (6-9 groups
    # plus headroom — the full-recipe detector segments at dice 0.9996, so
    # over-segmentation is rare; warp cost scales linearly in max_mov).
    # Heavy simulation uses 24 (the corpus convention), but the FIT only
    # needs n_movements groups: run-length grouping of N movements yields
    # <= N groups, and zero-padded masks make truncation to any bucket >=
    # the group count exact (tests/test_immoco_fit.py padding invariance).
    # BENCH_FITMOV sets the fit/bucket padding independently — the
    # production eval's movement bucketing (eval/runners.py buckets=[18]);
    # heavy: BENCH_NMOV=18 BENCH_MAXMOV=24 BENCH_FITMOV=18.
    n_mov = int(os.environ.get("BENCH_NMOV", "8"))  # light=8, heavy=18
    # Fit padding defaults to the DRAW size (light 8): run-length grouping
    # of n movements yields <= n groups, so this is exact (zero rows
    # dropped), the same bucketing the production eval applies per slice.
    fit_mov = int(os.environ.get("BENCH_FITMOV", str(min(n_mov, max_mov))))
    if fit_mov > max_mov or fit_mov < n_mov:
        raise SystemExit(
            f"BENCH_FITMOV={fit_mov} must satisfy BENCH_NMOV={n_mov} <= "
            f"fit_mov <= BENCH_MAXMOV={max_mov}"
        )

    # Banding measured slightly slower than dense one-hots at 320^2 (the
    # K=96 blocks underutilize the MXU); the displacement cap alone improves
    # converged quality, so they are independent knobs.
    band = int(os.environ.get("BENCH_BAND", "0"))
    disp_cap = int(os.environ.get("BENCH_DISPCAP", "30"))
    cfg = InstanceFitConfig(
        iters=iters,
        max_movements=fit_mov,
        image_inr=ImageINRConfig(encoding=enc),
        motion_inr=MotionINRConfig(encoding="lattice"),
        warp_band_px=band,
        motion_disp_px=disp_cap if disp_cap > 0 else None,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        kspace_op=os.environ.get("BENCH_KOP", "fft"),
        warp_tile_px=int(os.environ.get("BENCH_TILE", "0")),
        warp_impl=os.environ.get("BENCH_WARP", "pallas_tiled"),
        warp_pallas_tile_px=int(os.environ.get("BENCH_PTILE", "64")),
        # Source-window edge override (0 = 2*tile).  Pairs with DISPCAP:
        # exactness needs cap <= (win - tile)/2 - 2, e.g. PWIN=96 DISPCAP=14.
        warp_pallas_win_px=int(os.environ.get("BENCH_PWIN", "0")),
        # Default 4: the displacement field is evaluated on an 80^2 lattice
        # and linearly upsampled.  Under coarse-to-fine, motres 4 is
        # quality-neutral-to-positive (PERFORMANCE.md round 2 cont.:
        # 75@256 at 2.34/0.9891/35.12 -> +motres4 2.22/0.9888/35.22).
        motion_res_factor=int(os.environ.get("BENCH_MOTRES", "4")),
        # Trailing motion-frozen iterations (BENCH_FREEZE=K): the last K
        # full-res iterations hold the Motion INR fixed and run the warp as
        # precomputed-weight apply-only Pallas kernels (config.py
        # motion_freeze_iters; 28.8 vs 51.4 ms/iter measured).  Default 25
        # leaves ~54 joint full-res iterations at the 115-iter default —
        # the measured compressed-schedule quality cliff (PERFORMANCE.md
        # round 3); the round-2 200-iter protocol used BENCH_FREEZE=60.
        motion_freeze_iters=int(os.environ.get("BENCH_FREEZE", "25")),
        # Joint-span duty cycling (BENCH_DUTY="jxf", e.g. 5x10): alternate
        # j joint iterations with f motion-frozen ones across the full-res
        # joint span (config.py motion_duty; '' = off).
        motion_duty=(
            tuple(int(v) for v in os.environ["BENCH_DUTY"].split("x"))
            if os.environ.get("BENCH_DUTY")
            else ()
        ),
        # Plain joint iterations before duty cycling begins
        # (BENCH_DUTY_START=K; config.py motion_duty_start rationale).
        motion_duty_start=int(os.environ.get("BENCH_DUTY_START", "0")),
        # Coarse-to-fine: BENCH_C2F iterations against the center-cropped
        # k-space on a BENCH_CSIZE^2 raster first (0 = off), or a
        # '+'-separated pyramid (config.py coarse_schedule).  Default
        # 12@192+24@256 pairs with the 115-iter default (PERFORMANCE.md
        # round-3 compression table).  For heavy (BENCH_NMOV=18
        # BENCH_MAXMOV=24) use a single-phase BENCH_C2F=<n> — pyramids
        # REGRESS heavy psnr (PERFORMANCE.md round 2).
        **_c2f_env(),
    )

    images = phantom_stack(batch, size, size, seed=0)

    @jax.jit
    def prepare(images, key):
        keys = jax.random.split(key, images.shape[0])

        def one(img, k):
            # Simulation keeps the corpus' max_movements padding (the draw
            # depends on it); the fit pads only to fit_mov — grouping N
            # movements yields <= N groups, so rows beyond fit_mov are
            # all-zero and truncation is exact.
            sim = simulate_motion_2d(k, img, n_movements=n_mov, max_movements=max_mov)
            masks, _ = extract_movement_groups(sim.mask[0], size, max_mov)
            return sim.kspace, masks[:fit_mov]

        return jax.vmap(one)(images, keys)

    ksp, masks = prepare(images, jax.random.PRNGKey(0))
    from miccai24_immoco_tpu.utils.hostio import sync as _sync
    _sync(masks)

    model = build_immoco(cfg, size, size)
    # BENCH_SEG=0: the whole multi-phase fit as ONE compiled program (one
    # ~390 ms tunnel launch instead of one per phase/segment — the fixed
    # per-execution cost, PERFORMANCE.md cost model).  Today's fits are only
    # ~5-15 s of device time, far below the ~O(1 min) program-kill bound
    # that originally forced segmentation.  BENCH_SEG=N keeps the segmented
    # runner (one launch per <=N-iteration phase chunk).
    seg_len = int(os.environ.get("BENCH_SEG", "50"))
    if seg_len == 0:
        from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_fit

        fit = jax.jit(make_batched_fit(model))
    else:
        fit = make_batched_segmented_fit(model, segment_len=seg_len)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)

    from miccai24_immoco_tpu.utils.hostio import readback, sync

    # Warmup / compile.
    r = fit(ksp, masks, keys, model.statics)
    sync(r.losses)

    t0 = time.perf_counter()
    r = fit(ksp, masks, keys, model.statics)
    sync(r.losses)
    elapsed = time.perf_counter() - t0
    per_slice = elapsed / batch

    @jax.jit
    def quality(image, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(image)[:, None]),
            center_crop_quarter(jnp.abs(gt)[:, None]),
        )
        return jnp.stack([m.ssim, m.psnr])

    fit_q = readback(quality(r.image, images))

    # Budget-matched second reading (VERDICT r3 weak #1): the default bench
    # number times a COMPRESSED schedule (the lambda schedule scales with
    # iters, so it is a rescaled protocol) — but the A100 could compress
    # too, so the 200-iteration round-2 protocol is timed alongside whenever
    # the default config is benched.  BENCH_MATCHED=0 disables.
    matched = {}
    if (
        os.environ.get("BENCH_MATCHED", "1") == "1"
        and iters != 200
        and "BENCH_NMOV" not in os.environ  # light protocol only
    ):
        import dataclasses as _dc

        mcfg = _dc.replace(
            cfg,
            iters=200,
            max_movements=max(fit_mov, min(10, max_mov)),
            coarse_iters=0,
            coarse_schedule=((30, 192), (45, 256)),
            motion_freeze_iters=60,
        )
        mmodel = build_immoco(mcfg, size, size)
        mfit = make_batched_segmented_fit(mmodel, segment_len=seg_len or 50)
        mmasks = masks
        if mcfg.max_movements > fit_mov:
            import jax.numpy as _jnp

            mmasks = _jnp.pad(
                masks,
                ((0, 0), (0, mcfg.max_movements - fit_mov), (0, 0), (0, 0)),
            )
        mr = mfit(ksp, mmasks, keys, mmodel.statics)
        sync(mr.losses)
        t0 = time.perf_counter()
        mr = mfit(ksp, mmasks, keys, mmodel.statics)
        sync(mr.losses)
        m_per_slice = (time.perf_counter() - t0) / batch
        mq = readback(quality(mr.image, images))
        matched = {
            "matched_200_value": round(m_per_slice, 4),
            "matched_200_vs_baseline": round(
                A100_REFERENCE_SECONDS_PER_SLICE / m_per_slice, 2
            ),
            "matched_200_ssim": round(float(mq[0]), 4),
            "matched_200_psnr": round(float(mq[1]), 2),
        }

    @jax.jit
    def corrupt_quality(ksp, gt):
        return quality(ifft2c(ksp), gt)

    cor_q = readback(corrupt_quality(ksp, images))

    print(
        json.dumps(
            {
                "metric": "immoco_instance_fit_per_slice_latency",
                "value": round(per_slice, 4),
                "unit": "s/slice",
                "vs_baseline": round(
                    A100_REFERENCE_SECONDS_PER_SLICE / per_slice, 2
                ),
                "batch": batch,
                "iters": iters,
                "size": size,
                "encoding": enc,
                "band_px": band,
                "max_movements": fit_mov,
                "sim_max_movements": max_mov,
                "ssim_fit": round(float(fit_q[0]), 4),
                "psnr_fit": round(float(fit_q[1]), 2),
                "ssim_corrupted": round(float(cor_q[0]), 4),
                "psnr_corrupted": round(float(cor_q[1]), 2),
                "device": str(jax.devices()[0]),
                "baseline_note": "vs documented 4.0 s/slice A100 estimate (BASELINE.md)",
                **matched,
            }
        )
    )


if __name__ == "__main__":
    main()
