"""Probe: where do the AF+ bilevel NaN gradients come from?

For each stability variant, draws N motion simulations and computes the raw
outer (metric-network) gradient of the unrolled 30-step inner autofocus,
counting non-finite gradient pytrees — BEFORE the optax.zero_nans guard
masks them.

Variants:
  ref        — verbatim reference semantics (rot moments differentiated
               through the whole chain, no rsqrt epsilon)
  rot_detach — detach rot moments like x/y (train_afplus.py knob)
  eps        — rsqrt(moment2 + 1e-12)
  both       — rot_detach + eps

Usage: python scripts/probe_afplus_nan.py [SIZE] [N] [variants,...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.train.train_afplus import (
    AFPlusTrainConfig,
    afplus_inner_unrolled,
)
from miccai24_immoco_tpu.train.train_denoiser import denoiser_loss
from miccai24_immoco_tpu.data.synthetic import brain_phantom
from miccai24_immoco_tpu.utils.hostio import readback

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 24
VARIANTS = (
    sys.argv[3].split(",") if len(sys.argv) > 3
    else ["ref", "rot_detach", "eps"]
)

KNOBS = {
    "ref": dict(rot_moment_detach=False, inner_eps=0.0),
    "rot_detach": dict(rot_moment_detach=True, inner_eps=0.0),
    "eps": dict(rot_moment_detach=False, inner_eps=1e-12),
    "both": dict(rot_moment_detach=True, inner_eps=1e-12),
}


def main():
    net = build_unet(
        UnetConfig(in_chans=1, out_chans=1, chans=32, num_pool_layers=6,
                   norm="instance")
    )
    params = net.init(
        {"params": jax.random.PRNGKey(228)},
        jnp.zeros((1, SIZE, SIZE, 1), jnp.float32),
        train=False,
    )["params"]
    cfg = AFPlusTrainConfig(nufft_chunk=0 if SIZE < 320 else 12800)

    img = brain_phantom(SIZE, SIZE, seed=3)

    for variant in VARIANTS:
        knobs = KNOBS[variant]

        @jax.jit
        def grad_norm(params, key, img):
            gt = jnp.abs(img)
            sim = simulate_motion_2d(key, img)
            img_c = ifft2c(sim.kspace)
            ks = fft2c(
                (img_c - jnp.abs(img_c).mean())
                / (jnp.abs(img_c).std() + 1e-11)
            )

            def metric_fn_of(p):
                return lambda x: net.apply(
                    {"params": p}, x[None, :, :, None], train=False
                )[0, :, :, 0]

            def loss_fn(p):
                yp = afplus_inner_unrolled(
                    metric_fn_of(p), ks, cfg.inner_iters,
                    cfg.nufft_oversamp, nufft_chunk=cfg.nufft_chunk,
                    **knobs,
                )
                out = jnp.abs(ifft2c(yp))[None, None] * 1e4
                return denoiser_loss(out, gt[None, None] * 1e4)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            leaves = jax.tree_util.tree_leaves(grads)
            finite = jnp.all(
                jnp.asarray([jnp.all(jnp.isfinite(g)) for g in leaves])
            )
            gn = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves)
            return loss, jnp.sqrt(gn), finite

        bad = 0
        t0 = time.time()
        for i in range(N):
            loss, gn, finite = grad_norm(
                params, jax.random.PRNGKey(10_000 + i), img
            )
            ok = bool(readback(finite))
            if not ok:
                bad += 1
            if i < 3 or not ok:
                print(
                    f"  [{variant}] draw {i}: loss={float(readback(loss)):.4f}"
                    f" |g|={float(readback(gn)):.3e} finite={ok}",
                    flush=True,
                )
        print(
            f"{variant}: {bad}/{N} non-finite gradient draws "
            f"({time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
