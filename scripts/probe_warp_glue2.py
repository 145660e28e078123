"""Round-5 probe: where the fused warp's ~14 ms of non-kernel time lives.

Hoist-proof decomposition of bilinear_sample_tiled_pallas_planes at fit
shapes (B=4, M=8, 320^2, tile 64, win 96).  Known: full call 15.3 ms/rep,
production kernel alone 1.4 ms/rep.  Variants (carry = the raw grids, so
every rep re-executes everything downstream of them):

  full        — unnormalize + _build + kernel + untile + |.|^2 loss
  no_build    — _build hoisted out of the loop (windows/gyl/gxl prebuilt,
                carry-perturbed): kernel + untile + loss
  no_untile   — full minus untile: loss on tiled (K, M, C, n) output
  build_only  — unnormalize + _build + loss on windows/gyl/gxl (no kernel)
  tilec_only  — just the two _tile_coords transposes + loss

Usage: python scripts/probe_warp_glue2.py [R]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    _build, _fwd_kernel, _tile_coords, _untile, _window_starts,
)
from miccai24_immoco_tpu.ops.warp import identity_grid
from miccai24_immoco_tpu.utils.hostio import sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B, M, H, W = 4, 8, 320, 320
TILE, WIN, C = 64, 96, 2
NY = NX = H // TILE
K = NY * NX
N = TILE * TILE


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def kernel_call(gyl, gxl, windows):
    kern = functools.partial(_fwd_kernel, wy=WIN, wx=WIN, c=C)
    return pl.pallas_call(
        kern, grid=(K, M),
        in_specs=[
            pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, M, C, N), jnp.float32),
    )(gyl, gxl, windows)


def scan_force(one):
    def run(*xs):
        def step(c, _):
            v = jax.vmap(one)(c, *xs[1:])
            return c * (1.0 + 1e-12), v.sum()

        _, s = jax.lax.scan(step, xs[0], None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((B, C, H, W)), jnp.float32
    )
    cap = 14
    idg = identity_grid((H, W))
    gy = (
        jnp.asarray(rng.uniform(-2 * cap / H, 2 * cap / H, (B, M, H, W)),
                    jnp.float32)
        + idg[None, None, :, :, 1]
    )
    gx = (
        jnp.asarray(rng.uniform(-2 * cap / W, 2 * cap / W, (B, M, H, W)),
                    jnp.float32)
        + idg[None, None, :, :, 0]
    )

    def unnorm(g, size):
        return ((g + 1.0) * size - 1.0) * 0.5

    def full(gy1, gx1, pl1):
        gyp, gxp = unnorm(gy1, H), unnorm(gx1, W)
        windows, gyl, gxl, meta = _build(pl1, gyp, gxp, TILE, WIN)
        out = kernel_call(gyl, gxl, windows)
        img = _untile(out, M, NY, NX, TILE, C)
        return jnp.sum(img * img)

    timed("full      ", scan_force(full), gy, gx, planes)

    def no_untile(gy1, gx1, pl1):
        gyp, gxp = unnorm(gy1, H), unnorm(gx1, W)
        windows, gyl, gxl, meta = _build(pl1, gyp, gxp, TILE, WIN)
        out = kernel_call(gyl, gxl, windows)
        return jnp.sum(out * out)

    timed("no_untile ", scan_force(no_untile), gy, gx, planes)

    def build_only(gy1, gx1, pl1):
        gyp, gxp = unnorm(gy1, H), unnorm(gx1, W)
        windows, gyl, gxl, meta = _build(pl1, gyp, gxp, TILE, WIN)
        return (
            jnp.sum(windows.astype(jnp.float32) ** 2)
            + jnp.sum(gyl * gyl) + jnp.sum(gxl * gxl)
        )

    timed("build_only", scan_force(build_only), gy, gx, planes)

    def tilec_only(gy1, gx1, pl1):
        gyl = _tile_coords(unnorm(gy1, H), NY, NX, TILE)
        gxl = _tile_coords(unnorm(gx1, W), NY, NX, TILE)
        return jnp.sum(gyl * gyl) + jnp.sum(gxl * gxl)

    timed("tilec_only", scan_force(tilec_only), gy, gx, planes)

    # no_build: prebuild gyl/gxl/windows; carry is gyl.
    gyp, gxp = unnorm(gy, H), unnorm(gx, W)
    windows, gyl, gxl, meta = jax.vmap(
        lambda p, a, b: _build(p, a, b, TILE, WIN)[:3] + (0,)
    )(planes, gyp, gxp)[:3] + (None,) if False else (None, None, None, None)
    # simpler: build once eagerly via vmap
    built = jax.jit(jax.vmap(
        lambda p, a, b: _build(p, a, b, TILE, WIN)[:3]
    ))(planes, gyp, gxp)
    windows, gyl, gxl = built

    def no_build(gyl1, gxl1, w1):
        out = kernel_call(gyl1, gxl1, w1)
        img = _untile(out, M, NY, NX, TILE, C)
        return jnp.sum(img * img)

    timed("no_build  ", scan_force(no_build), gyl, gxl, windows)


if __name__ == "__main__":
    main()
