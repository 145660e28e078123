"""Do-no-harm fallback feasibility: does the fit's own final
data-consistency residual predict the slices where correction HURTS?

Across the full heavy corpus (protocol config: detector-driven, dc_replace,
coarse motion lattice), compares per slice the corrected-vs-corrupted
quality delta against self-supervised signals (final-iteration fit loss,
group count, corrupted-column count) exposed by
run_immoco_batched(return_diagnostics=True).  If high residual <=> negative
delta, a threshold fallback ("output the corrupted reconstruction when the
fit distrusts itself") rescues the failing tail without touching healthy
slices.

Usage: python scripts/probe_fallback.py [n_corpus] [scenario]
"""

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
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.runners import run_immoco_batched
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    scenario = sys.argv[2] if len(sys.argv) > 2 else "heavy"
    size = 320
    corpus = _synthetic_corpus(n, size, scenario, seed=2024)
    kld_name = weights.best_kld_name()
    kld = weights.load_kld(kld_name)

    max_mov = 12 if scenario == "light" else 24
    cfg = InstanceFitConfig(
        iters=200,
        max_movements=max_mov,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        motion_res_factor=2,
        dc_replace=True,
    )
    buckets = [10] if scenario == "light" else [18]
    metrics, diags = run_immoco_batched(
        corpus, cfg, kld=kld, limit=n, batch_size=4, segment_len=50,
        buckets=buckets, return_diagnostics=True,
    )

    @jax.jit
    def cscore(ksp, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(ifft2c(ksp)))[None, None],
            center_crop_quarter(jnp.abs(gt))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr])

    print(
        "slice | final_loss | groups cols | d_ssim_cl d_psnr_cl | verdict",
        flush=True,
    )
    rows = []
    for i in range(n):
        cs, cp = readback(
            cscore(
                put_complex(corpus["kspace_motion"][i]),
                put_complex(corpus["image_clean"][i]),
            )
        )
        d_ssim = metrics[i]["ssim_clean"] - float(cs)
        d_psnr = metrics[i]["psnr_clean"] - float(cp)
        rows.append((i, diags[i]["final_loss"], diags[i]["n_groups"],
                     diags[i]["corrupted_cols"], d_ssim, d_psnr))
    for i, fl, ng, cc, ds, dp in sorted(rows, key=lambda r: -r[1]):
        verdict = "HURT" if (ds < 0 and dp < 0) else (
            "mixed" if (ds < 0 or dp < 0) else "help")
        print(
            f"{i:5d} | {fl:10.4f} | {ng:6d} {cc:4.0f} |"
            f" {ds:+9.4f} {dp:+9.2f} | {verdict}",
            flush=True,
        )
    fls = np.array([r[1] for r in rows])
    dss = np.array([r[4] for r in rows])
    dps = np.array([r[5] for r in rows])
    print(
        f"\ncorr(final_loss, d_ssim) = {np.corrcoef(fls, dss)[0, 1]:+.3f}, "
        f"corr(final_loss, d_psnr) = {np.corrcoef(fls, dps)[0, 1]:+.3f}",
    )
    # Oracle fallback headroom: per-slice max(corrected, corrupted).
    base = np.array([
        [m["ssim_clean"], m["psnr_clean"]] for m in metrics
    ])
    print(f"corrected mean ssim_clean {base[:,0].mean():.4f} "
          f"psnr_clean {base[:,1].mean():.2f}")
    orac = base.copy()
    hurt = dss < 0
    orac[hurt, 0] -= dss[hurt]
    hurtp = dps < 0
    orac[hurtp, 1] -= dps[hurtp]
    print(f"oracle per-metric fallback mean ssim {orac[:,0].mean():.4f} "
          f"psnr {orac[:,1].mean():.2f} "
          f"(ssim hurt on {int(hurt.sum())}/{n}, psnr on {int(hurtp.sum())})")
    for tau in (0.05, 0.1, 0.2, 0.3, 0.5):
        sel = fls > tau
        s = base[:, 0] - np.where(sel, 0, 0) + np.where(sel, -dss, 0)
        p = base[:, 1] + np.where(sel, -dps, 0)
        print(f"tau={tau:4.2f}: fallback on {int(sel.sum()):2d} slices -> "
              f"mean ssim {s.mean():.4f} psnr {p.mean():.2f}")


if __name__ == "__main__":
    main()
