"""On-device golden + timing for the tiled Pallas warp vs the matmul warp.

Usage: python scripts/probe_warp_tiled.py [M] [REPS]
Timing uses two scan lengths to divide out the fixed per-program cost
(CLAUDE.md landmine 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.ops.warp import identity_grid
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm
from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    bilinear_sample_tiled_pallas,
)
from miccai24_immoco_tpu.utils.hostio import sync

H = W = 320
M = int(sys.argv[1]) if len(sys.argv) > 1 else 10
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
DISP = 30  # pixels, the bench displacement cap


@jax.jit
def setup(key):
    img = jax.lax.complex(
        jax.random.normal(key, (H, W)), jax.random.normal(key, (H, W))
    )
    disp = jax.random.uniform(key, (M, H, W, 2), minval=-1.0, maxval=1.0)
    disp = disp * jnp.asarray([2.0 * DISP / W, 2.0 * DISP / H])
    idg = identity_grid((H, W))
    return img, disp + idg[None]


def timed(tag, make_loop):
    outs = {}
    for reps in (REPS, 2 * REPS):
        f = jax.jit(make_loop(reps))
        f(img, grids)
        sync(f(img, grids))
        t0 = time.perf_counter()
        sync(f(img, grids))
        outs[reps] = time.perf_counter() - t0
    per = (outs[2 * REPS] - outs[REPS]) / REPS * 1000
    print(f"{tag}: {per:.2f} ms/op (fixed-cost-corrected)", flush=True)


def main():
    global img, grids
    img, grids = setup(jax.random.PRNGKey(0))

    # Golden: tiled pallas vs matmul warp at full size on device.
    @jax.jit
    def golden(img, grids):
        a = bilinear_sample_tiled_pallas(img, grids)
        b = bilinear_sample_mm(img, grids)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

    d, m = golden(img, grids)
    from miccai24_immoco_tpu.utils.hostio import readback

    d, m = float(readback(d)), float(readback(m))
    print(f"golden 320^2 M={M}: maxdiff={d:.4g} refmax={m:.4g} "
          f"({'OK' if d < 3e-2 * m else 'FAIL'})", flush=True)

    impls = {
        "tiled_pallas": lambda im, gr: bilinear_sample_tiled_pallas(im, gr),
        "matmul": lambda im, gr: bilinear_sample_mm(im, gr),
    }
    for name, warp in impls.items():
        # The loop-carried 1e-9*c perturbation of the grids makes every
        # iteration's warp input depend on the previous output, so XLA can
        # neither hoist the warp out of the scan nor DCE it (landmine 10).
        def fwd_loop(reps, warp=warp):
            def f(im, gr):
                def body(c, _):
                    out = warp(im, gr + 1e-9 * c)
                    return jnp.abs(out).mean(), None

                return jax.lax.scan(body, 0.0, None, length=reps)[0]

            return f

        timed(f"{name}_fwd", fwd_loop)

        def grad_loop(reps, warp=warp):
            def f(im, gr):
                def loss(i2, g2):
                    return jnp.sum(jnp.abs(warp(i2, g2)) ** 2)

                def body(c, _):
                    gi, gg = jax.grad(loss, argnums=(0, 1))(
                        im + 1e-9 * c, gr + 1e-9 * c
                    )
                    return jnp.abs(gi).mean() + jnp.abs(gg).mean(), None

                return jax.lax.scan(body, 0.0, None, length=reps)[0]

            return f

        timed(f"{name}_fwd+grad", grad_loop)


def main_vmapped(batch=4):
    """Same fwd+grad timing but vmapped over a batch of slices (the
    sharded-fit usage): isolates pallas-call vmap batching cost."""
    global img, grids
    img, grids = setup(jax.random.PRNGKey(0))
    imgs = jnp.stack([img] * batch)
    gridss = jnp.stack([grids] * batch)

    for name, warp in {
        "tiled_pallas": lambda im, gr: bilinear_sample_tiled_pallas(im, gr),
        "matmul": lambda im, gr: bilinear_sample_mm(im, gr),
    }.items():
        def fwd_loop(reps, warp=warp):
            def f(ims, grs):
                def body(c, _):
                    out = jax.vmap(warp)(ims + 0 * c, grs + 1e-9 * c)
                    return jnp.abs(out).mean(), None

                return jax.lax.scan(body, 0.0, None, length=reps)[0]

            return f

        outs = {}
        for reps in (REPS, 2 * REPS):
            f = jax.jit(fwd_loop(reps))
            f(imgs, gridss)
            sync(f(imgs, gridss))
            t0 = time.perf_counter()
            sync(f(imgs, gridss))
            outs[reps] = time.perf_counter() - t0
        per = (outs[2 * REPS] - outs[REPS]) / REPS * 1000
        print(f"vmap{batch} {name}_fwd: {per:.2f} ms/op", flush=True)

        def grad_loop(reps, warp=warp):
            def f(ims, grs):
                def loss(i2, g2):
                    out = jax.vmap(warp)(i2, g2)
                    return jnp.sum(jnp.abs(out) ** 2)

                def body(c, _):
                    gi, gg = jax.grad(loss, argnums=(0, 1))(
                        ims + 1e-9 * c, grs + 1e-9 * c
                    )
                    return jnp.abs(gi).mean() + jnp.abs(gg).mean(), None

                return jax.lax.scan(body, 0.0, None, length=reps)[0]

            return f

        outs = {}
        for reps in (REPS, 2 * REPS):
            f = jax.jit(grad_loop(reps))
            f(imgs, gridss)
            sync(f(imgs, gridss))
            t0 = time.perf_counter()
            sync(f(imgs, gridss))
            outs[reps] = time.perf_counter() - t0
        per = (outs[2 * REPS] - outs[REPS]) / REPS * 1000
        print(f"vmap{batch} {name}_fwd+grad: {per:.2f} ms/op", flush=True)


if __name__ == "__main__":
    if os.environ.get("PROBE_VMAP"):
        main_vmapped(int(os.environ["PROBE_VMAP"]))
    else:
        main()
