"""TPU-side AF+ outer-gradient NaN bisection.

probe_afplus_overfit measured NaN outer grads on EVERY draw at 320^2 with
the 32/6 metric net on the TPU, for rot_detach AND precond_detach — while
the identical computation is finite on CPU (probe_afplus_nan_bisect at
64-128^2; 320^2 CPU impractical on this 1-core host).  Hypotheses:

  (h1) TPU bf16 matmul/conv precision: catastrophic cancellation in
       variance-style terms at the 1e4 input scale (SSIM windows, instance
       norms) goes negative -> sqrt/rsqrt NaN, or precision-limited
       intermediate overflow.  Decisive test: jax.default_matmul_precision
       ("float32") around the loss ("prec32" variant).
  (h2) the outer loss (denoiser_loss: minmax L1 + nonneg SSIM at 1e4
       scale); test: replace with plain MSE ("mse" variant).
  (h3) depth of the unrolled chain; test: inner=1 vs 30 ("inner1").
  (h4) net size/depth; test: chans 8 / pools 3 at 320^2 ("smallnet").

Usage: python scripts/probe_afplus_nan_tpu.py v1 [v2 ...]
  variants: base prec32 mse inner1 smallnet prec32_mse
  (each compiles one 320^2 bilevel graph — minutes on first compile,
  cached afterwards)
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.config import MotionSimConfig
from miccai24_immoco_tpu.train.train_afplus import (
    AFPlusTrainConfig,
    afplus_inner_unrolled,
)
from miccai24_immoco_tpu.train.train_denoiser import denoiser_loss
from miccai24_immoco_tpu.utils.hostio import sync


SIZE = 320


def make_grad_fn(net, *, inner, precision, outer):
    cfg = AFPlusTrainConfig(
        inner_iters=inner, nufft_chunk=12800, precond_detach=True
    )

    def metric_fn_of(p):
        return lambda img: net.apply(
            {"params": p}, img[None, :, :, None], train=False
        )[0, :, :, 0]

    @jax.jit
    def grad_fn(params, key, kspace_clean):
        gt_img = jnp.abs(ifft2c(kspace_clean))
        sim = simulate_motion_2d(key, ifft2c(kspace_clean),
                                 cfg=MotionSimConfig())
        img_c = ifft2c(sim.kspace)
        ks = fft2c(
            (img_c - jnp.abs(img_c).mean()) / (jnp.abs(img_c).std() + 1e-11)
        )

        def loss_fn(p):
            with jax.default_matmul_precision(precision):
                yp_ks = afplus_inner_unrolled(
                    metric_fn_of(p), ks, cfg.inner_iters, cfg.nufft_oversamp,
                    nufft_chunk=cfg.nufft_chunk,
                    precond_detach=cfg.precond_detach,
                )
                out = jnp.abs(ifft2c(yp_ks))[None, None] * 1e4
                tgt = gt_img[None, None] * 1e4
                if outer == "mse":
                    return jnp.mean((out - tgt) ** 2) * 1e-8
                return denoiser_loss(out, tgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        flat = jax.tree_util.tree_leaves(grads)
        nonfinite = sum(
            (~jnp.isfinite(g)).sum().astype(jnp.int32) for g in flat
        )
        gnorm = jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum() for g in flat))
        return loss, gnorm, nonfinite

    return grad_fn


VARIANTS = {
    "base": dict(inner=30, precision="bfloat16", outer="denoiser", net=(32, 6)),
    "prec32": dict(inner=30, precision="float32", outer="denoiser", net=(32, 6)),
    "mse": dict(inner=30, precision="bfloat16", outer="mse", net=(32, 6)),
    "inner1": dict(inner=1, precision="bfloat16", outer="denoiser", net=(32, 6)),
    "smallnet": dict(inner=30, precision="bfloat16", outer="denoiser", net=(8, 3)),
    "prec32_mse": dict(inner=30, precision="float32", outer="mse", net=(32, 6)),
    # Chain-depth bisection (inner1 finite, inner30 NaN for the 32/6 net):
    # per-step cotangent amplification makes the backward grow
    # exponentially in depth; these measure the growth rate.
    "inner5": dict(inner=5, precision="bfloat16", outer="denoiser", net=(32, 6)),
    "inner10": dict(inner=10, precision="bfloat16", outer="denoiser", net=(32, 6)),
    "inner20": dict(inner=20, precision="bfloat16", outer="denoiser", net=(32, 6)),
    # Committed-distribution metric-net size (weights.py denoiser_full is
    # 16/5): is the full 30-step chain finite at this capacity?
    "net16": dict(inner=30, precision="bfloat16", outer="denoiser", net=(16, 5)),
}


def main():
    names = sys.argv[1:] or ["base", "prec32"]
    images = phantom_stack(2, SIZE, SIZE, seed=3)
    kspace = jax.jit(fft2c)(images)
    key0 = jax.random.PRNGKey(228)

    results = {}
    for name in names:
        v = VARIANTS[name]
        chans, pools = v["net"]
        net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=chans,
                                    num_pool_layers=pools, norm="instance"))
        params = net.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 1), jnp.float32), train=False,
        )["params"]
        gf = make_grad_fn(net, inner=v["inner"], precision=v["precision"],
                          outer=v["outer"])
        rows = []
        for i in range(2):
            loss, gnorm, nf = gf(params, jax.random.fold_in(key0, i),
                                 kspace[i])
            rows.append(dict(loss=float(loss), gnorm=float(gnorm),
                             nonfinite_count=int(nf)))
            print(f"{name} draw {i}: {rows[-1]}", flush=True)
        results[name] = rows
    print(json.dumps(results))


if __name__ == "__main__":
    main()
