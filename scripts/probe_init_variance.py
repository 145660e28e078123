"""Quantify instance-fit initialization sensitivity on heavy slices.

probe_heavy_failures.py measured a ~3 dB PSNR spread for the same slice
between two runs that differed only in batch composition (i.e. init PRNG
key).  This probe fits the SAME slice with K different keys and reports the
per-seed PSNR plus the final data-consistency loss — if low loss predicts
high PSNR, best-of-K restart selection is a principled (self-supervised)
quality fix; if not, the spread is pure prior-landscape luck.

Usage: python scripts/probe_init_variance.py [idx,...] [K]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.runners import _metrics_dict
from miccai24_immoco_tpu.ops.losses import gradient_entropy
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_segmented_fit
from miccai24_immoco_tpu.utils.hostio import put_complex


def main():
    idx = ([int(i) for i in sys.argv[1].split(",")]
           if len(sys.argv) > 1 else [16, 1, 25])
    k_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = max(idx) + 1
    corpus = _synthetic_corpus(n, 320, "heavy", seed=2024)

    cfg = InstanceFitConfig(
        iters=200,
        max_movements=18,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        dc_replace=bool(int(os.environ.get("PROBE_DC", "1"))),
        motion_res_factor=2,
    )
    model = build_immoco(cfg, 320, 320)
    run = make_batched_segmented_fit(model, segment_len=50)
    groups = jax.jit(
        lambda ind: extract_movement_groups(ind, 320, cfg.max_movements)
    )
    base = jax.random.PRNGKey(0)
    for i in idx:
        ksp = put_complex(corpus["kspace_motion"][i])
        masks, _ = groups(jnp.asarray(corpus["mask"][i][0] > 0))
        ksp_b = jnp.broadcast_to(ksp, (k_seeds, *ksp.shape))
        masks_b = jnp.broadcast_to(masks, (k_seeds, *masks.shape))
        keys = jnp.stack([jax.random.fold_in(base, 1000 * i + s)
                          for s in range(k_seeds)])
        r = run(ksp_b, masks_b, keys, model.statics)
        tail_loss = np.asarray(r.losses)[:, -10:].mean(0) if r.losses.ndim == 2 \
            else np.asarray(r.losses)[-10:]
        ges = np.asarray(jax.jit(jax.vmap(gradient_entropy))(r.image))
        print(f"slice {i}:")
        rows = []
        for s in range(k_seeds):
            m = _metrics_dict(r.image[s], put_complex(corpus["image_rss"][i]))
            loss_s = float(np.asarray(r.losses)[s, -10:].mean()) \
                if np.asarray(r.losses).ndim == 2 else float("nan")
            rows.append((s, m["psnr"], m["ssim"], loss_s, float(ges[s])))
            print(f"  seed {s}: psnr {m['psnr']:6.2f} ssim {m['ssim']:.4f} "
                  f"final_loss {loss_s:.6f} ge {float(ges[s]):.4f}")
        ps = np.array([r_[1] for r_ in rows])
        ls = np.array([r_[3] for r_ in rows])
        ge = np.array([r_[4] for r_ in rows])
        pick = int(np.argmin(ge))
        print(f"  spread {ps.max() - ps.min():.2f} dB; "
              f"corr(loss, psnr) {np.corrcoef(ls, ps)[0, 1]:+.3f}; "
              f"corr(ge, psnr) {np.corrcoef(ge, ps)[0, 1]:+.3f}; "
              f"min-GE pick psnr {ps[pick]:.2f} (best {ps.max():.2f}, "
              f"mean {ps.mean():.2f})")


if __name__ == "__main__":
    main()
