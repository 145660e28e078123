"""Baseline comparison on TPU: corrupted vs Autofocusing vs U-Net denoiser
vs IM-MoCo over a synthetic corpus (the reference's method-comparison story,
test_{autofocusing,unet_denoiser,immoco}.py).

Usage: python scripts/eval_baselines.py [n_slices] [scenario] [denoiser_ckpt]
Writes results/baselines/comparison.{json,tex}.
"""

import json
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
    AutofocusingConfig,
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.harness import aggregate, latex_table
from miccai24_immoco_tpu.eval.runners import (
    run_autofocusing,
    run_denoiser,
    run_immoco_batched,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scenario = sys.argv[2] if len(sys.argv) > 2 else "light"
    den_ckpt = sys.argv[3] if len(sys.argv) > 3 else (
        weights.path_of("denoiser_full")
        if weights.available("denoiser_full") else None)
    corpus = _synthetic_corpus(n, 320, scenario, seed=2024)
    kld_name = weights.best_kld_name()
    kld = weights.load_kld(kld_name) if weights.available(kld_name) else None
    max_mov = 12 if scenario == "light" else 24

    results = {}

    # Corrupted baseline.
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
    from miccai24_immoco_tpu.utils.hostio import put_complex, readback

    @jax.jit
    def cm(ksp, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(ifft2c(ksp)))[None, None],
            center_crop_quarter(jnp.abs(gt))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr, m.haarpsi, m.rmse])

    results["corrupted"] = [
        dict(zip(("ssim", "psnr", "haar_psi", "rmse"), map(float, readback(
            cm(put_complex(corpus["kspace_motion"][i]),
               put_complex(corpus["image_rss"][i]))))))
        for i in range(n)
    ]

    # Autofocusing (matmul bicubic, oracle/detected masks like the driver).
    results["autofocusing"] = run_autofocusing(
        corpus, AutofocusingConfig(iters=60, max_movements=max_mov), kld=kld,
        limit=n,
    )
    print("autofocusing:", aggregate(results["autofocusing"]), flush=True)

    # U-Net denoiser (if a checkpoint is available; arch from its metadata).
    if den_ckpt and os.path.exists(den_ckpt):
        from miccai24_immoco_tpu.cli import _load_denoiser

        net, params = _load_denoiser(den_ckpt)
        results["unet_denoiser"] = run_denoiser(corpus, net, params, limit=n)
        print("denoiser:", aggregate(results["unet_denoiser"]), flush=True)

    # IM-MoCo — the measured-best TPU fit configuration (bench.py defaults,
    # pre-warmed in .jax_cache; artifacts/e2e_round2_50slice config).
    cfg = InstanceFitConfig(
        iters=200,
        max_movements=max_mov,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl=os.environ.get("E2E_WARP", "pallas_tiled"),
        compute_dtype=os.environ.get("E2E_DTYPE", "bfloat16"),
        dc_replace=bool(int(os.environ.get("E2E_DC", "1"))),
        motion_res_factor=int(os.environ.get("E2E_MOTRES", "2")),
    )
    buckets = [10] if scenario == "light" else [18]
    results["immoco"] = run_immoco_batched(
        corpus, cfg, kld=kld, limit=n, batch_size=min(n, 4), segment_len=50,
        buckets=buckets,
    )
    print("immoco:", aggregate(results["immoco"]), flush=True)

    out_dir = "results/baselines"
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"comparison_{scenario}.json"), "w") as f:
        json.dump({k: {"per_slice": v, "aggregate": aggregate(v)}
                   for k, v in results.items()}, f, indent=2)
    with open(os.path.join(out_dir, f"comparison_{scenario}.tex"), "w") as f:
        f.write(latex_table(results, f"Method comparison ({scenario})",
                            f"comparison_{scenario}"))
    for k, v in results.items():
        print(k, json.dumps(aggregate(v)), flush=True)


if __name__ == "__main__":
    main()
