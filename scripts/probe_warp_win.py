"""Micro-bench: tiled Pallas warp fwd / fwd+bwd at fit shapes vs win_px.

Round-4 question: the ablation (scripts/ablate_timing.py, mm8 pallas_tiled)
shows the joint step is ~52 ms/iter with the warp and ~17 without, with
fwd_only at 2.2 — i.e. the warp BACKWARD path is the dominant term.  Yet
shrinking the window 128 -> 96 (25% fewer hat elements + matmul FLOPs)
moved the end-to-end bench <1%.  This probe isolates the warp call at
exactly the fit's shapes to see whether the time is in the kernels
(win-dependent) or the surrounding XLA glue (transposes, window stacking,
overlap-add un-slicing — win-independent).

Usage: python scripts/probe_warp_win.py [M B R] (defaults 8 4 30)
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

from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    bilinear_sample_tiled_pallas_planes,
)
from miccai24_immoco_tpu.utils.hostio import sync

M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
R = int(sys.argv[3]) if len(sys.argv) > 3 else 30
H = W = 320
TILE = int(sys.argv[4]) if len(sys.argv) > 4 else 64
WINS = (
    tuple(int(w) for w in sys.argv[5].split(",")) if len(sys.argv) > 5
    else (0, 96)
)


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
    cap = 14
    gy = jnp.asarray(
        rng.uniform(-2 * cap / H, 2 * cap / H, (B, M, H, W)), jnp.float32
    )
    gx = jnp.asarray(
        rng.uniform(-2 * cap / W, 2 * cap / W, (B, M, H, W)), jnp.float32
    )
    from miccai24_immoco_tpu.ops.warp import identity_grid

    idg = identity_grid((H, W))  # (H, W, 2)
    gy = gy + idg[None, None, :, :, 1]
    gx = gx + idg[None, None, :, :, 0]

    def make(win, grad):
        def warp_loss(pair, gy1, gx1):
            img = jax.lax.complex(pair[..., 0], pair[..., 1])
            out = bilinear_sample_tiled_pallas_planes(
                img, gy1, gx1, tile_px=TILE, win_px=win
            )
            return jnp.sum(jnp.abs(out) ** 2)

        def one(pair, gy1, gx1):
            if grad:
                l, gs = jax.value_and_grad(warp_loss, argnums=(0, 1, 2))(
                    pair, gy1, gx1
                )
                return l + sum(g.sum() for g in gs)
            return warp_loss(pair, gy1, gx1)

        def run(pairs, gys, gxs):
            def step(c, _):
                v = jax.vmap(one)(c, gys, gxs)
                return c * (1.0 + 1e-12 * v.mean()), v.sum()

            c, s = jax.lax.scan(step, pairs, None, length=R)
            return s.sum()

        return run

    for win in WINS:
        tag = win or 2 * TILE
        timed(f"t{TILE} win{tag} fwd    ", make(win, False), img_pair, gy, gx)
        timed(f"t{TILE} win{tag} fwd+bwd", make(win, True), img_pair, gy, gx)


if __name__ == "__main__":
    main()
