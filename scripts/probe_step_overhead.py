"""Round-5 probe: Mosaic per-grid-step launch overhead on this backend.

Round-4 left a contradiction: the fused warp converges to ~18.6 us per
(movement, window) grid step across window sizes (win 128 vs 96 flat) AND
across step counts (tile 80 flat, tile 32 only mildly worse) — so the cost
is neither per-element nor purely per-step.  This probe measures a kernel
whose per-step work is near-zero (copy an (8, 128) block) and one matching
the warp's block sizes but skipping all compute, at several grid sizes.
If ms scales ~linearly with steps at ~15-20 us/step regardless of content,
the floor is pure Mosaic/tunnel step overhead and the movement-stacked
formulation (fewer, fatter steps) must win; if the null kernel is fast, the
floor is in the warp kernel's own schedule (hat+matmul serialization).

Usage: python scripts/probe_step_overhead.py [R]
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


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def _null_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def null_run(steps, blk=(8, 128)):
    x = jnp.zeros((steps, *blk), jnp.float32)

    def one(x):
        return pl.pallas_call(
            _null_kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((1, *blk), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, *blk), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((steps, *blk), jnp.float32),
        )(x)

    def run(x):
        def step(c, _):
            v = one(c)
            return v * (1.0 + 1e-12), v.sum()

        c, s = jax.lax.scan(step, x, None, length=R)
        return s.sum()

    return run, x


def _mm_kernel(a_ref, w_ref, o_ref):
    # One warp-shaped matmul per step: (n, win) @ (win, win), rows bf16.
    rows = jax.lax.dot_general(
        a_ref[0], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = rows


def mm_run(steps, n, win, shared_w=True):
    a = jnp.zeros((steps, n, win), jnp.bfloat16)
    w = jnp.zeros((1 if shared_w else steps, win, win), jnp.bfloat16)

    def one(a, w):
        return pl.pallas_call(
            _mm_kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, n, win), lambda i: (i, 0, 0)),
                pl.BlockSpec(
                    (1, win, win),
                    (lambda i: (0, 0, 0)) if shared_w else (lambda i: (i, 0, 0)),
                ),
            ],
            out_specs=pl.BlockSpec((1, n, win), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((steps, n, win), jnp.float32),
        )(a, w)

    def run(a, w):
        def step(c, _):
            v = one(c, w)
            return c * (1.0 + 1e-12), v.sum()

        c, s = jax.lax.scan(step, a, None, length=R)
        return s.sum()

    return run, (a, w)


def main():
    for steps in (100, 200, 400, 800):
        fn, x = null_run(steps)
        timed(f"null blk8x128   steps={steps:4d}", fn, x)
    # Warp-shaped matmul steps: current geometry (n=4096, win=96) vs the
    # movement-stacked geometry (n=8192/16384, win=96, 2-4x fewer steps).
    for steps, n in ((800, 4096), (400, 8192), (200, 16384)):
        try:
            fn, args = mm_run(steps, n, 96)
            timed(f"mm n={n:5d} win=96 steps={steps:4d}", fn, *args)
        except Exception as e:  # vmem or compile failure is itself a result
            print(f"mm n={n} steps={steps}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
