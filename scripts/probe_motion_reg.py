"""lambda_motion sweep on the failing heavy slices.

probe_motion_disp.py found slice 1 of the seed-2024 heavy corpus converges
to a degenerate basin with ~7.3 px mean fitted displacement on EVERY group
(healthy slices fit ~1.9 px), under equally-heavy true corruption — and
every restart seed lands there.  This probe sweeps the displacement-L2
penalty (config.py lambda_motion) to test whether pulling the motion INR
toward zero steers the fit into the healthy basin.

The penalty weight is threaded as a RUNTIME scalar through a probe-local
segment function (the product path bakes cfg.lambda_motion into the graph;
a sweep would recompile per value on the remote TPU compile service).

Usage: python scripts/probe_motion_reg.py [lam,lam,...] [idx,idx,...]
Defaults: 0,1,10,100 on slices 1,11,16.
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
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy, real_pair_mse
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    lams = [
        float(v)
        for v in (sys.argv[1] if len(sys.argv) > 1 else "0,1,10,100").split(",")
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

    def segment_lm(params, opt_state, k_in, masks, sched_seg, lam_mot, statics):
        # Product segment body (models/immoco.py make_segmented_fit) with the
        # displacement penalty weight as a runtime scalar.
        def loss_fn(p, lam):
            k_out, image, mot = model.forward(
                p, masks, statics, with_motion=True
            )
            return (
                real_pair_mse(k_out, k_in)
                + lam * gradient_entropy(image)
                + lam_mot * mot["l2"]
            )

        def step(carry, lam):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, lam)
            updates, s = opt.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        carry, losses = jax.lax.scan(step, (params, opt_state), sched_seg)
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

    print("lam_mot | slice | ssim/psnr vs clean | fit_mean_px", flush=True)
    for lam_mot in lams:
        params, opt_state, k_in, scale = vinit(ksp, keys, model.statics)
        for s, e, phase in fit_windows(cfg, 50):
            assert phase < 0, "probe assumes no coarse phases"
            params, opt_state, _ = vseg(
                params,
                opt_state,
                k_in,
                masks,
                jnp.asarray(lambdas[s:e]),
                jnp.float32(lam_mot),
                model.statics,
            )
        images, _ = vfin(params, k_in, masks, scale, model.statics)
        vdisp = jax.jit(jax.vmap(disp_px_mean, in_axes=(0, 0, None)))
        dpx_all = readback(vdisp(params, masks, model.statics))
        for j, i in enumerate(idxs):
            ssim, psnr = readback(
                score(images[j], put_complex(sub_clean[j]))
            )
            print(
                f"{lam_mot:7.1f} | {i:5d} | {ssim:.4f}/{psnr:5.2f} |"
                f" {float(dpx_all[j]):8.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
