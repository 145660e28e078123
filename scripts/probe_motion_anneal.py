"""Annealed lambda_motion sweep on the failing heavy slices.

probe_motion_reg.py measured: the degenerate ~7 px basin (slices 1/11 of
the seed-2024 heavy corpus) is not escapable by CONSTANT displacement-L2
regularization — but the lambda -> inf limit (motion pinned ~0) beats the
basin on every tail slice.  The anneal hypothesis (VERDICT r2 next#5):
hold motion near zero through the basin-forming early iterations, then
release to reference dynamics (config.py lambda_motion_anneal_frac).

The per-iteration weight is threaded as a RUNTIME VECTOR through a
probe-local segment (one compile for every anneal shape; the product path
bakes the schedule into the graph).

Usage: python scripts/probe_motion_anneal.py [l0:frac,...] [idx,...]
Defaults: 0:0,1000:0.25,10000:0.25,10000:0.5 on slices 1,11,16.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import optax

from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    fit_schedule,
    fit_windows,
    make_segmented_fit,
)
from miccai24_immoco_tpu.ops.losses import gradient_entropy, real_pair_mse
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    specs = [
        (float(v.split(":")[0]), float(v.split(":")[1]))
        for v in (sys.argv[1] if len(sys.argv) > 1
                  else "0:0,1000:0.25,10000:0.25,10000:0.5").split(",")
    ]
    idxs = [
        int(i)
        for i in (sys.argv[2] if len(sys.argv) > 2 else "1,11,16").split(",")
    ]
    size, n_mov, n_corpus = 320, 18, 50

    corpus = _synthetic_corpus(n_corpus, size, "heavy", seed=2024)

    cfg = InstanceFitConfig(
        iters=200,
        max_movements=n_mov,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        motion_res_factor=2,
        dc_replace=True,
    )
    model = build_immoco(cfg, size, size)
    single = make_segmented_fit(model, segment_len=50)
    opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)

    def segment_lm(params, opt_state, k_in, masks, sched_seg, lm_seg, statics):
        # Product segment body with the annealed displacement penalty as a
        # runtime per-iteration vector (scanned alongside lambda).
        def loss_fn(p, lam, lam_m):
            k_out, image, mot = model.forward(
                p, masks, statics, with_motion=True
            )
            return (
                real_pair_mse(k_out, k_in)
                + lam * gradient_entropy(image)
                + lam_m * mot["l2"]
            )

        def step(carry, x):
            lam, lam_m = x
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, lam, lam_m)
            updates, s = opt.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        carry, losses = jax.lax.scan(
            step, (params, opt_state), (sched_seg, lm_seg)
        )
        return carry[0], carry[1], losses

    vinit = jax.jit(jax.vmap(single.init_fn, in_axes=(0, 0, None)))
    vseg = jax.jit(
        jax.vmap(segment_lm, in_axes=(0, 0, 0, 0, None, None, None))
    )
    vfin = jax.jit(jax.vmap(single.finalize_fn, in_axes=(0, 0, 0, 0, None)))

    @jax.jit
    def disp_px_mean(params, masks, statics):
        _, _, mot = model.forward(params, masks, statics, with_motion=True)
        w = jnp.clip(masks.sum(axis=(-2, -1)), 0.0, 1.0)
        return (mot["px_mean"] * w).sum() / jnp.maximum(w.sum(), 1.0)

    @jax.jit
    def score(x, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(x))[None, None],
            center_crop_quarter(jnp.abs(gt))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr])

    sub_ks = corpus["kspace_motion"][np.asarray(idxs)]
    sub_clean = corpus["image_clean"][np.asarray(idxs)]
    sub_mask = corpus["mask"][np.asarray(idxs)]

    masks = jnp.stack(
        [
            extract_movement_groups(
                jnp.asarray(sub_mask[j][0] > 0), size, cfg.max_movements
            )[0]
            for j in range(len(idxs))
        ]
    )
    ksp = put_complex(sub_ks)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(0), jnp.asarray(idxs)
    )
    lambdas = fit_schedule(cfg)

    print("l0:frac | slice | ssim/psnr vs clean | fit_mean_px", flush=True)
    for l0, frac in specs:
        end = max(int(frac * cfg.iters), 1)
        lm_full = l0 * np.clip(
            1.0 - np.arange(cfg.iters, dtype=np.float32) / end, 0.0, 1.0
        )
        params, opt_state, k_in, scale = vinit(ksp, keys, model.statics)
        for s, e, phase in fit_windows(cfg, 50):
            assert phase < 0, "probe assumes no coarse phases"
            params, opt_state, _ = vseg(
                params,
                opt_state,
                k_in,
                masks,
                jnp.asarray(lambdas[s:e]),
                jnp.asarray(lm_full[s:e]),
                model.statics,
            )
        images, _ = vfin(params, k_in, masks, scale, model.statics)
        vdisp = jax.jit(jax.vmap(disp_px_mean, in_axes=(0, 0, None)))
        dpx_all = readback(vdisp(params, masks, model.statics))
        for j, i in enumerate(idxs):
            ssim, psnr = readback(score(images[j], put_complex(sub_clean[j])))
            print(
                f"{l0:7.0f}:{frac:4.2f} | {i:5d} | {ssim:.4f}/{psnr:5.2f} |"
                f" {float(dpx_all[j]):8.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
