"""Micro-bench: which XLA glue around the tiled Pallas warp is slow?

probe_warp_win.py showed the fused warp fwd+bwd (35.7 ms/rep, B=4 M=8
320^2) is window-size-INdependent — so the cost is not hat elements or
matmul FLOPs but the surrounding XLA ops.  Candidates, timed here in
isolation inside scans at the exact fit shapes:

  tile_coords  — (M,Ho,Wo) -> (K,M,1,n) rank-5 transpose (fwd, x2 planes)
  stack_win    — 25-slice window stacking (fwd)
  untile_out   — (K,M,C,n) -> (M,Ho,Wo,C) transpose (fwd)
  dout_tile    — (M,Ho,Wo,C) -> (K,M,C,n) transpose (bwd)
  unslice_add  — 25x overlap-add of (C,win,win) gradients (bwd)
  kernel_fwd   — pallas fwd kernel alone on pre-built operands
  kernel_bwd   — pallas bwd kernel alone on pre-built operands

Usage: python scripts/probe_warp_glue.py [M B R]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from miccai24_immoco_tpu.ops import warp_tiled_pallas as wtp
from miccai24_immoco_tpu.utils.hostio import sync

M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
R = int(sys.argv[3]) if len(sys.argv) > 3 else 30
H = W = 320
TILE = 64
WIN = 128
NY = NX = H // TILE
K = NY * NX
N = TILE * TILE
C = 2


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.2f} ms/rep (compile {tc:.1f}s)", flush=True)


def scan_over(body, *xs):
    """Scan R reps of body over perturbed first input (defeats CSE/DCE)."""

    def run(*args):
        def step(c, _):
            r = body(c, *args[1:])
            leaves = jax.tree_util.tree_leaves(r)
            s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
            return c * (1.0 + 1e-12 * s), s

        c, s = jax.lax.scan(step, args[0], None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    gy = jnp.asarray(rng.standard_normal((B, M, H, W)), jnp.float32)
    planes = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    out_kmcn = jnp.asarray(
        rng.standard_normal((B, K, M, C, N)), jnp.float32
    )
    d_out = jnp.asarray(rng.standard_normal((B, M, H, W, C)), jnp.float32)
    d_win = jnp.asarray(
        rng.standard_normal((B, K, C, WIN, WIN)), jnp.float32
    )
    gyl = jnp.asarray(
        rng.uniform(0, WIN - 1, (B, K, M, 1, N)), jnp.float32
    )
    windows = jnp.asarray(
        rng.standard_normal((B, K, C, WIN, WIN)), jnp.bfloat16
    )

    sys_ = wtp._window_starts(H, NY, TILE, WIN)
    sxs_ = wtp._window_starts(W, NX, TILE, WIN)

    timed(
        "tile_coords",
        scan_over(lambda g: jax.vmap(
            lambda g1: wtp._tile_coords(g1, NY, NX, TILE))(g)),
        gy,
    )
    timed(
        "stack_win  ",
        scan_over(lambda p: jax.vmap(
            lambda p1: jnp.stack(
                [p1[:, sy:sy + WIN, sx:sx + WIN] for sy in sys_ for sx in sxs_]
            ).astype(jnp.bfloat16))(p)),
        planes,
    )
    timed(
        "untile_out ",
        scan_over(lambda o: jax.vmap(
            lambda o1: wtp._untile(o1, M, NY, NX, TILE, C))(o)),
        out_kmcn,
    )
    timed(
        "dout_tile  ",
        scan_over(lambda d: jax.vmap(
            lambda d1: d1.reshape(M, NY, TILE, NX, TILE, C)
            .transpose(1, 3, 0, 5, 2, 4)
            .reshape(K, M, C, N))(d)),
        d_out,
    )

    def unslice(dw1):
        d_planes = jnp.zeros((C, H, W), jnp.float32)
        ki = 0
        for sy in sys_:
            for sx in sxs_:
                d_planes = d_planes.at[:, sy:sy + WIN, sx:sx + WIN].add(
                    dw1[ki]
                )
                ki += 1
        return d_planes

    timed("unslice_add", scan_over(lambda dw: jax.vmap(unslice)(dw)), d_win)

    def kernel_fwd(gyl1, gxl1, win1):
        return pl.pallas_call(
            functools.partial(wtp._fwd_kernel, wy=WIN, wx=WIN, c=C),
            grid=(K, M),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((K, M, C, N), jnp.float32),
        )(gyl1, gxl1, win1)

    timed(
        "kernel_fwd ",
        scan_over(lambda g, g2, w: jax.vmap(kernel_fwd)(g, g2, w)),
        gyl, gyl, windows,
    )

    first = jnp.zeros((M, 1, N), jnp.float32).at[0].set(1.0)

    def kernel_bwd(gyl1, gxl1, win1, dout1):
        return pl.pallas_call(
            functools.partial(wtp._bwd_kernel, wy=WIN, wx=WIN, c=C),
            grid=(K, M),
            in_specs=[
                pl.BlockSpec((1, 1, N), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, C, WIN, WIN), jnp.float32),
                jax.ShapeDtypeStruct((K, M, 1, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((K, M, 1, N), jnp.bfloat16),
            ],
        )(first, gyl1, gxl1, win1, dout1)

    timed(
        "kernel_bwd ",
        scan_over(
            lambda g, g2, w, d: jax.vmap(
                lambda a, b2, c2, d2: kernel_bwd(a, b2, c2, d2)
            )(g, g2, w, d)
        ),
        gyl, gyl, windows, out_kmcn,
    )


if __name__ == "__main__":
    main()
