"""Per-component timing ablation of the MOTION-FROZEN fit step on TPU.

The frozen step (apply-only Pallas warp, Image INR only) measures
28.8 ms/iter at the bench config vs an expected ~14 (warp apply ~6 +
image INR ~4 + FFT/GE/Adam ~4, PERFORMANCE.md round-2 breakdown) — this
probe locates the unexplained remainder.

Variants (bench config: 320^2, batch 4, M=10, motres 4, bf16,
pallas_tiled warp, frozen weights precomputed outside the scan):

  full          — real frozen step (loss grad wrt image INR + Adam)
  fwd_only      — forward only
  no_warp       — warp apply replaced by broadcast
  no_image_inr  — direct (H, W, 2) parameter image instead of the INR
  no_ge         — gradient-entropy prior removed
  no_fft        — FFTs replaced by identity
  xla_apply     — warp apply via the XLA tiled weights path instead of
                  the Pallas kernels (bilinear_apply_tiled)

Usage: python scripts/probe_frozen_ablate.py [variant ...]
Env: ABL_M (10), ABL_BATCH (4), ABL_SEG (20), ABL_MOTRES (4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

SEG = int(os.environ.get("ABL_SEG", "20"))
H = W = 320
M = int(os.environ.get("ABL_M", "10"))
B = int(os.environ.get("ABL_BATCH", "4"))


def build(warp_impl="pallas_tiled"):
    cfg = InstanceFitConfig(
        iters=SEG,
        max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        motion_res_factor=int(os.environ.get("ABL_MOTRES", "4")),
        compute_dtype="bfloat16",
        warp_impl=warp_impl,
        warp_pallas_tile_px=64,
    )
    return build_immoco(cfg, H, W)


def make_segment(model, variant):
    cfg = model.cfg
    opt = optax.adam(cfg.learning_rate)

    def forward_frozen(p_img, extra, wts, masks, statics):
        if variant == "no_image_inr":
            image = jax.lax.complex(extra[..., 0], extra[..., 1])
        else:
            image = model.predict_image({"image": p_img}, statics)
        if variant == "no_warp":
            motion_images = jnp.broadcast_to(image[None], (M, H, W))
        elif variant == "xla_apply" or model.cfg.warp_impl == "matmul":
            from miccai24_immoco_tpu.ops.warp_mm import bilinear_apply_tiled

            motion_images = bilinear_apply_tiled(image, wts)
        else:
            from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                warp_tiled_frozen_apply,
            )

            motion_images = warp_tiled_frozen_apply(image, wts)
        if variant == "no_fft":
            dc = image * (1.0 - masks.sum(0))
            mov = (motion_images * masks).sum(0)
        else:
            dc = fft2c(image) * (1.0 - masks.sum(0))
            mov = (fft2c(motion_images) * masks).sum(0)
        return dc + mov, image

    @jax.jit
    def segment(params, opt_state, k_in, masks, statics):
        def one_slice(params, opt_state, k_in, masks):
            wts = model.frozen_warp_weights(params, masks, statics)
            p0 = params["image"]
            extra = jnp.zeros((H, W, 2), jnp.float32)
            grad_target = extra if variant == "no_image_inr" else p0
            s0 = opt.init(grad_target)

            def loss_fn(gt_):
                p_img = p0 if variant == "no_image_inr" else gt_
                ex = gt_ if variant == "no_image_inr" else extra
                k_out, image = forward_frozen(p_img, ex, wts, masks, statics)
                loss = real_pair_mse(k_out, k_in)
                if variant != "no_ge":
                    loss = loss + 1e-2 * gradient_entropy(image)
                return loss

            def step(carry, _):
                p, s = carry
                if variant == "fwd_only":
                    loss = loss_fn(p)
                    p = jax.tree.map(lambda a: a * 1.0, p)
                    return (p, s), loss
                loss, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), loss

            (p, s), losses = jax.lax.scan(
                step, (grad_target, s0), None, length=SEG
            )
            return losses

        return jax.vmap(one_slice, in_axes=(0, None, 0, 0))(
            params, None, k_in, masks
        )

    return segment


def main():
    variants = sys.argv[1:] or (
        "full,fwd_only,no_warp,no_image_inr,no_ge,no_fft,xla_apply"
    ).split(",")
    model = build()
    base_params = model.init(jax.random.PRNGKey(0))
    params_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)), base_params
    )
    masks = jnp.zeros((B, M, H, W), jnp.float32).at[:, 0, :, 100:110].set(1.0)
    k_in = jax.jit(
        lambda: jnp.full((B, H, W), 1.0 + 0.0j, jnp.complex64)
    )()

    for variant in variants:
        try:
            mdl = build("matmul") if variant == "xla_apply" else model
            pb = params_b
            segment = make_segment(mdl, variant)
            t0 = time.perf_counter()
            l = segment(pb, None, k_in, masks, mdl.statics)
            _ = float(jax.jit(jnp.sum)(l))
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            l = segment(pb, None, k_in, masks, mdl.statics)
            _ = float(jax.jit(jnp.sum)(l))
            t_run = time.perf_counter() - t0
            print(
                f"{variant}: {t_run:.3f} s/segment ({t_run/SEG*1000:.1f} "
                f"ms/iter batch {B}) [first {t_compile:.1f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
