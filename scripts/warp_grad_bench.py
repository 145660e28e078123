"""Micro-bench: warp forward+backward at fit shapes, autodiff vs custom VJP.

Isolates the warp's gradient cost (the fit step's dominant term per
scripts/ablate_timing.py) without the INRs/FFT/Adam around it.

Usage: python scripts/warp_grad_bench.py [M B R]
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

from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm
from miccai24_immoco_tpu.utils.hostio import sync

M = int(sys.argv[1]) if len(sys.argv) > 1 else 12
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
R = int(sys.argv[3]) if len(sys.argv) > 3 else 20
H = W = 320


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.2f} ms/rep (compile {tc:.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    img_pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    grids = jnp.asarray(
        0.05 * rng.standard_normal((B, M, H, W, 2)), jnp.float32
    )

    def make(use_cvjp, grad):
        def warp_loss(pair, gr):
            img = jax.lax.complex(pair[..., 0], pair[..., 1])
            out = bilinear_sample_mm(img, gr, use_custom_vjp=use_cvjp)
            return jnp.sum(jnp.abs(out) ** 2)

        def one(pair, gr):
            if grad:
                l, (g1, g2) = jax.value_and_grad(warp_loss, argnums=(0, 1))(
                    pair, gr
                )
                return l + g1.sum() + g2.sum()
            return warp_loss(pair, gr)

        def run(pairs, grs):
            def step(c, _):
                v = jax.vmap(one)(c, grs)
                return c * (1.0 + 1e-12 * v.mean()), v.sum()

            c, s = jax.lax.scan(step, pairs, None, length=R)
            return s.sum()

        return run

    timed("autodiff fwd", make(False, False), img_pair, grids)
    timed("autodiff fwd+bwd", make(False, True), img_pair, grids)
    timed("custom  fwd+bwd", make(True, True), img_pair, grids)

    # Custom backward piece by piece: which of the three matmuls hurts?
    from miccai24_immoco_tpu.ops.warp_mm import (
        _one_hot_pair,
    )

    n = H * W
    gx = jnp.asarray(rng.uniform(0, W - 1, (n,)), jnp.float32)
    gy = jnp.asarray(rng.uniform(0, H - 1, (n,)), jnp.float32)
    planes = jnp.asarray(rng.standard_normal((H, W, 2)), jnp.bfloat16)
    d_out = jnp.asarray(rng.standard_normal((n, 2)), jnp.bfloat16)

    def rep(body):
        def run(planes, gx, gy, d_out):
            def step(c, _):
                r = body(c, gx, gy, d_out)
                return c + 1e-12 * r.astype(c.dtype), r.sum()
            c, s = jax.lax.scan(step, planes, None, length=R * M * B)
            return s.sum()
        return run

    def onehots(c, gx, gy, d_out):
        lo_y, hi_y, ty = _one_hot_pair(gy, H, jnp.bfloat16)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        return ay[:1, :1] * 1.0

    def rows_mm(c, gx, gy, d_out):
        lo_y, hi_y, ty = _one_hot_pair(gy, H, jnp.bfloat16)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        rows = jax.lax.dot_general(
            ay, c.reshape(H, W * 2), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return rows[:1, :1] * 1.0

    def dplanes_mm(c, gx, gy, d_out):
        lo_y, hi_y, ty = _one_hot_pair(gy, H, jnp.bfloat16)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        lo_x, hi_x, tx = _one_hot_pair(gx, W, jnp.bfloat16)
        ax = lo_x * (1.0 - tx)[:, None] + hi_x * tx[:, None]
        tmp = (ax[:, :, None] * d_out[:, None, :]).reshape(n, W * 2)
        d_planes = jax.lax.dot_general(
            ay, tmp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return d_planes[:1, :1] * 1.0

    def dgrad_einsum(c, gx, gy, d_out):
        lo_y, hi_y, ty = _one_hot_pair(gy, H, jnp.bfloat16)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        lo_x, hi_x, tx = _one_hot_pair(gx, W, jnp.bfloat16)
        ax = lo_x * (1.0 - tx)[:, None] + hi_x * tx[:, None]
        rows = jax.lax.dot_general(
            ay, c.reshape(H, W * 2), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        ).reshape(n, W, 2)
        d_gx = jnp.einsum(
            "nwc,nw,nc->n", rows, ax, d_out,
            preferred_element_type=jnp.float32,
        )
        return d_gx[:1] * 1.0

    # Per-unit times: these loop R*M*B times over ONE movement-sized op.
    timed(f"one-hot build  x{R*M*B}", rep(onehots), planes, gx, gy, d_out)
    timed(f"rows matmul    x{R*M*B}", rep(rows_mm), planes, gx, gy, d_out)
    timed(f"d_planes matmul x{R*M*B}", rep(dplanes_mm), planes, gx, gy, d_out)
    timed(f"d_grid einsum  x{R*M*B}", rep(dgrad_einsum), planes, gx, gy, d_out)


if __name__ == "__main__":
    main()
