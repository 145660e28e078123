"""Micro-benchmark: warp implementations on TPU.

Times forward-only and forward+grad of the 24-movement 320^2 warp for the
gather and matmul implementations (20x scan loop to amortize dispatch).
Usage: python scripts/warp_bench.py [impl ...]  (gather matmul)
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

from miccai24_immoco_tpu.ops.warp import grid_sample
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm

H = W = 320
M = int(os.environ.get("WB_M", "24"))
REPS = 20


def run(name, fn, *args):
    out = fn(*args)
    _ = float(jax.jit(lambda x: jnp.sum(jnp.abs(x)))(out))  # sync
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.jit(lambda x: jnp.sum(jnp.abs(x)))(out))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/REPS*1000:.2f} ms/op ({dt:.2f}s for {REPS})", flush=True)


def main():
    impls = sys.argv[1:] or ["matmul", "gather"]

    @jax.jit
    def setup(key):
        img = jax.lax.complex(
            jax.random.normal(key, (H, W)), jax.random.normal(key, (H, W))
        )
        disp = 0.05 * jax.random.normal(key, (M, H, W, 2))
        ys = jnp.linspace(-1, 1, H)
        xs = jnp.linspace(-1, 1, W)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        idg = jnp.stack([gx, gy], -1)
        return img, disp + idg[None]

    img, grids = setup(jax.random.PRNGKey(0))

    def warp_gather(im, gr):
        return grid_sample(
            jnp.broadcast_to(im[None, None], (M, 1, H, W)),
            gr, mode="bilinear", padding_mode="zeros", align_corners=False,
        )[:, 0]

    def warp_matmul(im, gr):
        return bilinear_sample_mm(im, gr, align_corners=False)

    for name, warp in [("matmul", warp_matmul), ("gather", warp_gather)]:
        if name not in impls:
            continue

        @jax.jit
        def fwd_loop(im, gr):
            def body(c, _):
                out = warp(im, gr + 0.0 * c)
                return c + jnp.abs(out).mean() * 1e-9, None
            return jax.lax.scan(body, 0.0, None, length=REPS)[0]

        run(f"{name}_fwd", fwd_loop, img, grids)

        @jax.jit
        def grad_loop(im, gr):
            def loss(i2, g2):
                return jnp.sum(jnp.abs(warp(i2, g2)) ** 2)

            def body(c, _):
                gi, gg = jax.grad(loss, argnums=(0, 1))(im * (1 + 0 * c), gr)
                return c + jnp.abs(gi).mean() * 1e-9 + jnp.abs(gg).mean() * 1e-9, None

            return jax.lax.scan(body, 0.0, None, length=REPS)[0]

        run(f"{name}_fwd+grad", grad_loop, img, grids)


if __name__ == "__main__":
    main()
