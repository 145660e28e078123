"""Round-5 probe: same warp computation, different grid/block layouts.

probe_hat_cost.py: the fwd kernel's computation at flat grid=(800,) with
per-step streamed operands = 1.45 ms/rep.  Round-4 measured the REAL
pallas_call (grid=(K, M), window block resident across M, vmapped batch)
at 14.9 ms/rep with pre-built operands.  10x gap, same arithmetic.  This
probe walks from one to the other to find the guilty structure:

  flat1d       — grid=(800,), everything streamed per step  [baseline]
  grid2d       — grid=(100, 8), window block index ignores movement axis
  grid2d_strm  — grid=(100, 8), window block streamed per step (i*8+j... no:
                 same block shape indexed by both axes via a (K*M)-expanded
                 window array — measures residency vs streaming)
  grid3d_vmap  — the real thing: grid=(25, 8) + jax.vmap over B=4

Usage: python scripts/probe_grid_layout.py [R]
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

from miccai24_immoco_tpu.utils.hostio import sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B, K, M, N, WIN, C = 4, 25, 8, 4096, 96, 2


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def kern(gy_ref, gx_ref, w_ref, o_ref):
    n = gy_ref.shape[-1]
    win = w_ref.shape[-1]
    gy = gy_ref[...].reshape(n)
    gx = gx_ref[...].reshape(n)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1).astype(jnp.float32)
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(idx - gy[:, None])).astype(jnp.bfloat16)
    ax = jnp.maximum(0.0, 1.0 - jnp.abs(idx - gx[:, None])).astype(jnp.bfloat16)
    for ci in range(C):
        rows = jax.lax.dot_general(
            ay, w_ref[0, ci] if w_ref.ndim == 4 else w_ref[0, 0, ci],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        o_ref[0, ci] if False else None
        out = jnp.sum(rows * ax, axis=1, dtype=jnp.float32)
        if o_ref.ndim == 3:
            o_ref[0, ci] = out
        else:
            o_ref[0, 0, ci] = out


def scan_wrap(one, *xs):
    def run(*xs):
        def step(c, _):
            v = one(*xs)
            return c, v.sum()

        _, s = jax.lax.scan(step, 0.0, None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    steps = B * K * M
    gy_f = jnp.asarray(rng.uniform(0, WIN - 1, (steps, 1, N)), jnp.float32)
    gx_f = jnp.asarray(rng.uniform(0, WIN - 1, (steps, 1, N)), jnp.float32)
    w_f = jnp.asarray(rng.standard_normal((steps, C, WIN, WIN)), jnp.bfloat16)

    # flat1d
    def flat1d(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((steps, C, N), jnp.float32),
        )(gy, gx, w)

    timed("flat1d      ", scan_wrap(flat1d), gy_f, gx_f, w_f)

    # grid2d resident window: (B*K, M) grid, window indexed by axis 0 only
    bk = B * K
    gy2 = gy_f.reshape(bk, M, 1, N)
    gx2 = gx_f.reshape(bk, M, 1, N)
    w2 = jnp.asarray(rng.standard_normal((bk, C, WIN, WIN)), jnp.bfloat16)

    def grid2d(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(bk, M),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bk, M, C, N), jnp.float32),
        )(gy, gx, w)

    timed("grid2d_res  ", scan_wrap(grid2d), gy2, gx2, w2)

    # grid3d + vmap over batch: the production layout
    gy3 = gy_f.reshape(B, K, M, 1, N)
    gx3 = gx_f.reshape(B, K, M, 1, N)
    w3 = jnp.asarray(rng.standard_normal((B, K, C, WIN, WIN)), jnp.bfloat16)

    def one_slice(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(K, M),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((K, M, C, N), jnp.float32),
        )(gy, gx, w)

    def grid3d_vmap(gy, gx, w):
        return jax.vmap(one_slice)(gy, gx, w)

    timed("grid3d_vmap ", scan_wrap(grid3d_vmap), gy3, gx3, w3)

    # grid2d with movements OUTER (window re-streamed M times)
    def grid2d_mo(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(M, bk),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda j, i: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda j, i: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda j, i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda j, i: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bk, M, C, N), jnp.float32),
        )(gy, gx, w)

    timed("grid2d_mout ", scan_wrap(grid2d_mo), gy2, gx2, w2)


if __name__ == "__main__":
    main()
