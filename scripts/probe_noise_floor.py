"""Discriminating probe: is the heavy PSNR regression a noise-floor metric
artifact?  Re-evaluate the 4 worst heavy slices against a NOISE-FREE
version of the same phantoms (same RNG draw order, noise term zeroed)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np, jax, jax.numpy as jnp
from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.data.synthetic import brain_phantom_np
from miccai24_immoco_tpu import weights
from miccai24_immoco_tpu.config import ImageINRConfig, InstanceFitConfig, MotionINRConfig
from miccai24_immoco_tpu.eval.runners import _make_indicator_fn, _line_indicators
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_segmented_fit
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def psnr_minmax(p, g):
    h, w = g.shape
    ch, cw = h // 4, w // 4
    p = p[ch:-ch, cw:-cw]; g = g[ch:-ch, cw:-cw]
    pn = (p - p.min()) / (p.max() - p.min())
    gn = (g - g.min()) / (g.max() - g.min())
    return 10 * np.log10(1.0 / np.mean((pn - gn) ** 2))


corpus = _synthetic_corpus(50, 320, "heavy", seed=2024)
IDX = [44, 1, 30, 11]
kld = weights.load_kld(weights.best_kld_name())
cfg = InstanceFitConfig(
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
ksp = put_complex(corpus["kspace_motion"][IDX])
model = build_immoco(cfg, 320, 320)
run = make_batched_segmented_fit(model, segment_len=50)
res = run(ksp, masks, jax.random.split(jax.random.PRNGKey(0), 4),
          model.statics)
absfn = jax.jit(jnp.abs)
pred = np.asarray(readback(absfn(res.image)))
corr = np.asarray(readback(absfn(jax.jit(ifft2c)(ksp))))

for j, i in enumerate(IDX):
    gt = np.abs(corpus["image_rss"][i])
    gnf = np.abs(brain_phantom_np(320, 320, 2024 + i, noise=False))
    print(f"slice {i}: noisy-GT  corrupted {psnr_minmax(corr[j], gt):.2f}"
          f"  corrected {psnr_minmax(pred[j], gt):.2f} | "
          f"noise-free-GT  corrupted {psnr_minmax(corr[j], gnf):.2f}"
          f"  corrected {psnr_minmax(pred[j], gnf):.2f} | "
          f"GT-vs-NF floor {psnr_minmax(gt, gnf):.2f}", flush=True)
