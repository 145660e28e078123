"""Round-5 probe: bisect production warp-fwd slowness vs the fast flat probe.

Facts so far (all hoist-proof, 800 warp-unit steps, n=4096, win=96):
  - flat grid, 3-D blocks, streamed window, hats+mm in kernel: 1.3 ms/rep
    (probe_hat_cost2)
  - production call in the fit / round-4 kernel-alone probe: ~15 ms/rep
  - probe_grid_layout (kernel read via [...].reshape(n)): 13.4-13.8 ms/rep
    for EVERY grid layout — the reshape poisons the comparison.

Structural deltas bisected here, using the PRODUCTION _fwd_kernel verbatim:
  A exact      — grid=(K, M) 2-D + vmap over B, 4-D blocks, resident window
  B novmap     — grid=(B*K, M), batch folded into the window axis
  C flat4d     — grid=(B*K*M,), 4-D blocks, streamed window
  D reshaperead— fast 3-D variant but with [...].reshape(n) block reads

Usage: python scripts/probe_warp_exact.py [R]
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

from miccai24_immoco_tpu.ops.warp_tiled_pallas import _fwd_kernel
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


def scan_force(one, gy, *rest):
    def run(gy, *rest):
        def step(c, _):
            v = one(c, *rest)
            return c * (1.0 + 1e-12), v.sum()

        _, s = jax.lax.scan(step, gy, None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    kern = functools.partial(_fwd_kernel, wy=WIN, wx=WIN, c=C)

    # A: exact production layout — per-slice (K, M) grid, vmap over B.
    gy4 = jnp.asarray(rng.uniform(0, WIN - 1, (B, K, M, 1, N)), jnp.float32)
    gx4 = jnp.asarray(rng.uniform(0, WIN - 1, (B, K, M, 1, N)), jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((B, K, C, WIN, WIN)), jnp.bfloat16)

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

    timed("A exact      ", scan_force(
        lambda gy, gx, w: jax.vmap(one_slice)(gy, gx, w), gy4), gy4, gx4, w4)

    # B: no vmap — batch folded into the window grid axis.
    gyb = gy4.reshape(B * K, M, 1, N)
    gxb = gx4.reshape(B * K, M, 1, N)
    wb = w4.reshape(B * K, C, WIN, WIN)

    def novmap(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(B * K, M),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * K, M, C, N), jnp.float32),
        )(gy, gx, w)

    timed("B novmap     ", scan_force(novmap, gyb), gyb, gxb, wb)

    # C: flat grid, 4-D blocks, window streamed per step.
    gyf = gy4.reshape(B * K * M, 1, 1, N)
    gxf = gx4.reshape(B * K * M, 1, 1, N)
    wf = jnp.repeat(w4.reshape(B * K, 1, C, WIN, WIN), M, axis=1).reshape(
        B * K * M, C, WIN, WIN
    )

    def flat4d(gy, gx, w):
        return pl.pallas_call(
            kern, grid=(B * K * M,),
            in_specs=[
                pl.BlockSpec((1, 1, 1, N), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, N), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, N), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * K * M, 1, C, N), jnp.float32),
        )(gy, gx, w)

    timed("C flat4d     ", scan_force(flat4d, gyf), gyf, gxf, wf)

    # D: the fast 3-D layout but with [...].reshape reads.
    def kern_reshape(gy_ref, gx_ref, w_ref, o_ref):
        gy = gy_ref[...].reshape(N)
        gx = gx_ref[...].reshape(N)
        idx = jax.lax.broadcasted_iota(jnp.int32, (N, WIN), 1).astype(
            jnp.float32
        )
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(idx - gy[:, None])).astype(
            jnp.bfloat16
        )
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(idx - gx[:, None])).astype(
            jnp.bfloat16
        )
        for ci in range(C):
            rows = jax.lax.dot_general(
                ay, w_ref[0, ci],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            o_ref[0, ci] = jnp.sum(rows * ax, axis=1, dtype=jnp.float32)

    gy3 = gy4.reshape(B * K * M, 1, N)
    gx3 = gx4.reshape(B * K * M, 1, N)

    def reshaperead(gy, gx, w):
        return pl.pallas_call(
            kern_reshape, grid=(B * K * M,),
            in_specs=[
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, C, WIN, WIN), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * K * M, C, N), jnp.float32),
        )(gy, gx, w)

    timed("D reshaperead", scan_force(reshaperead, gy3), gy3, gx3, wf)


if __name__ == "__main__":
    main()
