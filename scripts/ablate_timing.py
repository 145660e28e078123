"""Per-component timing ablation of the IM-MoCo fit step on TPU.

Measures steady-state time of a 20-iteration compiled segment (vmapped over
ABL_BATCH slices, matmul warp, the bench configuration) with individual
components stubbed out, to locate the hot spot:

  full           — the real fit step (bench config)
  no_warp        — warp replaced by broadcast (keeps INRs, FFTs, masks)
  no_motion_inr  — motion INR replaced by zero displacement (keeps warp)
  no_image_inr   — image INR replaced by a direct (H, W, 2) parameter image
  no_ge          — gradient-entropy prior removed
  no_fft         — FFTs replaced by identity
  fwd_only       — forward pass only (no grad/Adam), full model
  dispatch       — trivial jitted fn (host/tunnel overhead floor)

Env knobs: ABL_M (12), ABL_BATCH (4), ABL_SEG (20), ABL_VARIANTS.

Usage: python scripts/ablate_timing.py [variant ...]
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
import optax

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy, real_pair_mse
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm

SEG = int(os.environ.get("ABL_SEG", "20"))
H = W = 320
M = int(os.environ.get("ABL_M", "12"))
B = int(os.environ.get("ABL_BATCH", "4"))


def build():
    cfg = InstanceFitConfig(
        iters=SEG,
        max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
    )
    return build_immoco(cfg, H, W)


XH = os.environ.get("ABL_XH", "0") == "1"


def make_segment(model, variant):
    cfg = model.cfg
    opt = optax.adam(cfg.learning_rate)

    def forward(p, masks, statics):
        if variant == "no_image_inr":
            image = jax.lax.complex(p["_img"][..., 0], p["_img"][..., 1])
        else:
            image = model.predict_image(p, statics)

        if variant == "no_motion_inr":
            disp_cf = jnp.zeros((2, M, H, W), jnp.float32)
        else:
            disp_cf = jnp.tanh(
                model.motion_inr.apply_cf(p["motion"], statics["motion"])
            )
            scale_cf = jnp.asarray(
                [2.0 * 30 / W, 2.0 * 30 / H], jnp.float32
            ).reshape(2, 1, 1, 1)
            disp_cf = disp_cf * scale_cf
        grids_cf = disp_cf + statics["id_grid_cf"][:, None]
        gx, gy = grids_cf[0], grids_cf[1]
        grids = None

        if variant == "warp_sg_coords":
            # Coordinate-gradient path severed: isolates the image-cotangent
            # half of the warp backward (window grads + unslice_add).
            gy = jax.lax.stop_gradient(gy)
            gx = jax.lax.stop_gradient(gx)
        if variant == "warp_sg_image":
            image_w = jax.lax.stop_gradient(image)
        else:
            image_w = image
        if variant == "no_warp":
            motion_images = jnp.broadcast_to(image[None], (M, H, W)) * (
                1.0 + 0.0 * gx
            )
        elif os.environ.get("ABL_WARP", "matmul") == "pallas_tiled":
            from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                bilinear_sample_tiled_pallas_planes,
            )

            motion_images = bilinear_sample_tiled_pallas_planes(
                image_w, gy, gx, align_corners=False, xla_hats=XH,
                win_px=int(os.environ.get("ABL_PWIN", "0")) or None,
            )
        else:
            motion_images = bilinear_sample_mm(
                image_w, jnp.stack([gx, gy], axis=-1), align_corners=False
            )

        if variant == "no_fft":
            dc = image * (1.0 - masks.sum(0))
            mov = (motion_images * masks).sum(0)
        else:
            k_mov = fft2c(motion_images)
            if os.environ.get("ABL_BARRIER", "1") == "1":
                # Match production compose_kspace's round-5 fusion barrier
                # (models/immoco.py): without it the scanned vjp of
                # warp->fft->mask-sum lowers pathologically.
                k_mov = jax.lax.optimization_barrier(k_mov)
            dc = fft2c(image) * (1.0 - masks.sum(0))
            mov = (k_mov * masks).sum(0)
        return dc + mov, image

    def add_extra_params(params):
        if variant == "no_image_inr":
            params = dict(params)
            params["_img"] = jnp.zeros((H, W, 2), jnp.float32)
        return params

    @jax.jit
    def segment(params, opt_state, k_in, masks, statics):
        def one_slice(params, opt_state, k_in, masks):
            def loss_fn(p):
                k_out, image = forward(p, masks, statics)
                loss = real_pair_mse(k_out, k_in)
                if variant != "no_ge":
                    loss = loss + 1e-2 * gradient_entropy(image)
                return loss

            def step(carry, _):
                p, s = carry
                if variant == "fwd_only":
                    loss = loss_fn(p)
                    # keep a param-dependent carry so the loop can't fold
                    p = jax.tree.map(lambda a: a * 1.0, p)
                    return (p, s), loss
                loss, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), loss

            (p, s), losses = jax.lax.scan(
                step, (params, opt_state), None, length=SEG
            )
            return losses

        return jax.vmap(
            lambda pr, st, k, ms: one_slice(pr, st, k, ms),
            in_axes=(0, 0, 0, 0),
        )(params, opt_state, k_in, masks)

    return segment, opt, add_extra_params


def main():
    variants = sys.argv[1:] or os.environ.get(
        "ABL_VARIANTS",
        "dispatch,full,fwd_only,no_warp,no_motion_inr,no_image_inr,no_ge,no_fft",
    ).split(",")
    model = build()
    base_params = model.init(jax.random.PRNGKey(0))
    masks = jnp.zeros((B, M, H, W), jnp.float32).at[:, 0, :, 100:110].set(1.0)
    k_in = jax.jit(
        lambda: jnp.full((B, H, W), 1.0 + 0.0j, jnp.complex64)
    )()

    for variant in variants:
        try:
            if variant == "dispatch":
                f = jax.jit(lambda x: x.sum() + 1.0)
                x = jnp.zeros((8, 128))
                _ = float(f(x))
                t0 = time.perf_counter()
                for _i in range(10):
                    _ = float(f(x))
                print(
                    f"dispatch+readback: {(time.perf_counter()-t0)/10*1000:.1f}"
                    " ms/call", flush=True)
                continue
            segment, opt, add_extra = make_segment(model, variant)
            params = add_extra(base_params)
            params_b = jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (B, *a.shape)), params
            )
            state_b = jax.vmap(opt.init)(params_b)
            t0 = time.perf_counter()
            l = segment(params_b, state_b, k_in, masks, model.statics)
            _ = float(jax.jit(jnp.sum)(l))
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            l = segment(params_b, state_b, k_in, masks, model.statics)
            _ = float(jax.jit(jnp.sum)(l))
            t_run = time.perf_counter() - t0
            print(
                f"{variant}: {t_run:.3f} s/segment ({t_run/SEG*1000:.1f} ms/iter"
                f" batch {B}) [first {t_compile:.1f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
