"""Diagnose the genuinely-failing heavy slices (round-2 50-slice artifact:
idx 1, 4 lose >3 dB PSNR even against the CLEAN ground truth).

Hypotheses (CLAUDE.md round-3 roadmap): (a) detector/grouping error — the
klD-Net under/over-segments the corrupted-line indicator so the fit's
forward model is wrong; (b) motion-INR degeneracy — the fit itself fails
even with perfect masks.

Protocol: rebuild the artifact's heavy corpus (seed 2024), select the worst
slices + healthy controls, and fit each twice — detector-driven (artifact
config) and oracle-mask — reporting per-slice indicator dice, group counts,
and PSNR/SSIM vs the noisy and clean GTs.  If oracle fixes a slice, the
detector/grouping is the culprit; if not, the fit is.

Usage: python scripts/probe_heavy_failures.py [idx,idx,...]
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
from miccai24_immoco_tpu.eval.runners import (
    _line_indicators,
    _make_indicator_fn,
    run_immoco_batched,
)
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    idx = ([int(i) for i in sys.argv[1].split(",")]
           if len(sys.argv) > 1 else [1, 4, 12, 16, 25, 0, 3, 5])
    n = max(idx) + 1
    corpus = _synthetic_corpus(n, 320, "heavy", seed=2024)
    sub = {k: np.asarray(v)[idx] for k, v in corpus.items()}

    kld_name = weights.best_kld_name()
    kld = weights.load_kld(kld_name)
    ind_fn = _make_indicator_fn(kld)
    groups = jax.jit(lambda ind: extract_movement_groups(ind, 320, 24))

    print(f"slice  oracle_groups  det_groups  ind_dice  ind_fp  ind_fn")
    for j, i in enumerate(idx):
        oracle = np.asarray(sub["mask"][j][0] > 0)
        det = np.asarray(readback(ind_fn(put_complex(sub["kspace_motion"][j]))))
        det_b = det > 0.5
        inter = (oracle & det_b).sum()
        dice = 2 * inter / max(oracle.sum() + det_b.sum(), 1)
        _, ng_o = groups(jnp.asarray(oracle))
        _, ng_d = groups(jnp.asarray(det_b))
        print(f"{i:>5}  {int(ng_o):>13}  {int(ng_d):>10}  {dice:>8.3f}"
              f"  {int((~oracle & det_b).sum()):>6}"
              f"  {int((oracle & ~det_b).sum()):>6}")

    cfg = InstanceFitConfig(
        iters=int(os.environ.get("PROBE_ITERS", "200")),
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        dc_replace=bool(int(os.environ.get("PROBE_DC", "1"))),
        motion_res_factor=int(os.environ.get("PROBE_MOTRES", "2")),
    )
    for name, use_kld in (("detected", kld), ("oracle", None)):
        m = run_immoco_batched(
            sub, cfg, kld=use_kld, batch_size=4, segment_len=50,
            buckets=[18],
        )
        print(f"\n== {name} masks ==")
        for j, i in enumerate(idx):
            r = m[j]
            print(f"{i:>5}  psnr {r['psnr']:6.2f}  psnr_clean"
                  f" {r['psnr_clean']:6.2f}  ssim {r['ssim']:.4f}"
                  f"  haar {r['haar_psi']:.4f}")


if __name__ == "__main__":
    main()
