"""A/B: does late-iteration Polyak/EMA averaging fix the heavy-scenario
PSNR overfit?  12 heavy slices (incl. the 4 worst), mean PSNR/SSIM deltas
vs corrupted."""
import sys
sys.path.insert(0, '/root/repo')
from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import dataclasses
import numpy as np, jax, jax.numpy as jnp
from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu import weights
from miccai24_immoco_tpu.config import ImageINRConfig, InstanceFitConfig, MotionINRConfig
from miccai24_immoco_tpu.eval.runners import _make_indicator_fn, _line_indicators
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_segmented_fit
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.utils.hostio import put_complex, readback

corpus = _synthetic_corpus(50, 320, "heavy", seed=2024)
IDX = [1, 11, 44, 30, 0, 5, 9, 14, 20, 25, 33, 40]
kld = weights.load_kld(weights.best_kld_name())
base = InstanceFitConfig(
    iters=200, max_movements=18,
    image_inr=ImageINRConfig(encoding="lattice"),
    motion_inr=MotionINRConfig(encoding="lattice"),
    motion_disp_px=30, warp_impl="pallas_tiled", compute_dtype="bfloat16",
    motion_res_factor=1)

indicator_fn = _make_indicator_fn(kld)
groups = jax.jit(lambda ind: extract_movement_groups(ind, 320, 18))
masks = jnp.stack([groups(_line_indicators(
    put_complex(corpus["kspace_motion"][i]), corpus["mask"][i], kld,
    indicator_fn))[0] for i in IDX])
gts = jnp.stack([put_complex(corpus["image_rss"][i]) for i in IDX])

met = jax.jit(lambda p, g: calmetric2d(
    center_crop_quarter(jnp.abs(p))[None, None],
    center_crop_quarter(jnp.abs(g))[None, None]))


def metrics_of(pred, gt):
    m = met(pred, gt)
    return float(readback(m.psnr)), float(readback(m.ssim))


corr_ms = [metrics_of(jax.jit(ifft2c)(put_complex(corpus["kspace_motion"][i])),
                      gts[j]) for j, i in enumerate(IDX)]
print("corrupted mean psnr/ssim:",
      np.mean([m[0] for m in corr_ms]).round(3),
      np.mean([m[1] for m in corr_ms]).round(4), flush=True)


def run_cfg(tag, cfg):
    model = build_immoco(cfg, 320, 320)
    run = make_batched_segmented_fit(model, segment_len=50)
    outs = []
    for s in range(0, len(IDX), 4):
        ksp = put_complex(corpus["kspace_motion"][IDX[s:s+4]])
        res = run(ksp, masks[s:s+4],
                  jax.random.split(jax.random.PRNGKey(0), 4), model.statics)
        for j in range(4):
            outs.append(metrics_of(res.image[j], gts[s + j]))
    dp = [o[0] - c[0] for o, c in zip(outs, corr_ms)]
    ds = [o[1] - c[1] for o, c in zip(outs, corr_ms)]
    print(f"{tag}: psnr {np.mean([o[0] for o in outs]):.3f} "
          f"(d {np.mean(dp):+.3f}, neg {sum(x<0 for x in dp)}/12) "
          f"ssim {np.mean([o[1] for o in outs]):.4f} (d {np.mean(ds):+.4f})",
          flush=True)


run_cfg("base          ", base)
run_cfg("ema95         ", dataclasses.replace(base, ema_decay=0.95))
run_cfg("ema99         ", dataclasses.replace(base, ema_decay=0.99))
run_cfg("ema99-start.25", dataclasses.replace(base, ema_decay=0.99,
                                              ema_start_frac=0.25))
