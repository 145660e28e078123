"""Per-component timing ablation of the IM-MoCo fit step on TPU.

Measures steady-state time of a 20-iteration compiled segment for variants
with individual components stubbed out, to locate the hot spot:

  full          — the real fit step
  no_warp       — grid_sample replaced by broadcast (keeps INRs, FFTs)
  no_motion_inr — motion INR replaced by zero displacement (keeps warp)
  no_ge         — gradient-entropy prior removed
  no_fft        — FFTs replaced by identity
  image_only    — image INR DC-only step
  dispatch      — trivial jitted fn (host/tunnel overhead floor)

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
from miccai24_immoco_tpu.ops.warp import grid_sample

SEG = 20
H = W = 320
M = 24


def build(img_enc="lattice", mot_enc="lattice"):
    cfg = InstanceFitConfig(
        iters=SEG,
        max_movements=M,
        image_inr=ImageINRConfig(encoding=img_enc),
        motion_inr=MotionINRConfig(encoding=mot_enc),
    )
    return build_immoco(cfg, H, W)


def make_segment(model, variant):
    cfg = model.cfg
    opt = optax.adam(cfg.learning_rate)

    def forward(p, masks, statics):
        pair = model.image_inr.apply(p["image"], statics["image"])
        image = jax.lax.complex(pair[..., 0], pair[..., 1])
        if variant == "image_only":
            return fft2c(image), image

        if variant == "no_motion_inr":
            disp = jnp.zeros((M, H, W, 2), jnp.float32)
        else:
            disp = jnp.tanh(model.motion_inr.apply(p["motion"], statics["motion"]))
        grids = disp + statics["id_grid"][None]

        if variant == "no_warp":
            motion_images = jnp.broadcast_to(image[None], (M, H, W)) * (
                1.0 + 0.0 * grids[..., 0]
            )
        else:
            motion_images = grid_sample(
                jnp.broadcast_to(image[None, None], (M, 1, H, W)),
                grids,
                mode="bilinear",
                padding_mode="zeros",
                align_corners=False,
            )[:, 0]

        if variant == "no_fft":
            dc = image * (1.0 - masks.sum(0))
            mov = (motion_images * masks).sum(0)
        else:
            dc = fft2c(image) * (1.0 - masks.sum(0))
            mov = (fft2c(motion_images) * masks).sum(0)
        return dc + mov, image

    @jax.jit
    def segment(params, opt_state, k_in, masks, statics):
        def loss_fn(p):
            k_out, image = forward(p, masks, statics)
            loss = real_pair_mse(k_out, k_in)
            if variant != "no_ge":
                loss = loss + 1e-2 * gradient_entropy(image)
            return loss

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=SEG
        )
        return params, opt_state, losses

    return segment, opt


def main():
    variants = sys.argv[1:] or [
        "dispatch", "full", "no_warp", "no_motion_inr", "no_ge", "no_fft",
        "image_only",
    ]
    model = build()
    params = model.init(jax.random.PRNGKey(0))
    opt0 = optax.adam(1e-2)
    masks = jnp.zeros((M, H, W), jnp.float32).at[0, :, 100:110].set(1.0)
    # Complex arrays must be produced BY a jitted computation on this
    # runtime (eager/host complex buffers poison the process).
    k_in = jax.jit(lambda: jnp.full((H, W), 1.0 + 0.0j, jnp.complex64))()

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
            segment, opt = make_segment(model, variant)
            state = opt.init(params)
            t0 = time.perf_counter()
            p, s, l = segment(params, state, k_in, masks, model.statics)
            # Force execution: a tiny jitted reduction + scalar read (plain
            # d2h of some buffers is unimplemented on this runtime, and
            # block_until_ready does not synchronize).
            _ = float(jax.jit(jnp.sum)(l))
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            p, s, l = segment(params, state, k_in, masks, model.statics)
            _ = float(jax.jit(jnp.sum)(l))
            t_run = time.perf_counter() - t0
            print(
                f"{variant}: {t_run:.3f} s/segment ({t_run/SEG*1000:.1f} ms/iter)"
                f" [first {t_compile:.1f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__} {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
