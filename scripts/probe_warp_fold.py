"""Probe: batch folded INTO the pallas grid (no vmap) vs jax.vmap batching.

If the folded version scales linearly, vmap's pallas batching is the
overhead and the kernel wrapper should register a custom_vmap rule.
Usage: python scripts/probe_warp_fold.py [B] [M] [REPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from miccai24_immoco_tpu.ops.warp import identity_grid
from miccai24_immoco_tpu.ops import warp_tiled_pallas as wtp
from miccai24_immoco_tpu.utils.hostio import sync

H = W = 320
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
DISP = 30
TILE = 64


def folded_forward(planes_b, gy_b, gx_b):
    """planes_b (B, C, H, W); gy_b/gx_b (B, M, Ho, Wo) pixel coords."""
    bsz, c, h, w = planes_b.shape
    _, m, ho, wo = gy_b.shape
    b = TILE
    win = 2 * TILE
    ny, nx = ho // b, wo // b
    k = ny * nx
    n = b * b
    sys_ = wtp._window_starts(h, ny, b, win)
    sxs_ = wtp._window_starts(w, nx, b, win)
    windows = jnp.stack(
        [
            planes_b[:, :, sy : sy + win, sx : sx + win]
            for sy in sys_
            for sx in sxs_
        ],
        axis=1,
    ).astype(jnp.bfloat16)  # (B, K, C, win, win)
    windows = windows.reshape(bsz * k, c, win, win)
    sy_t = jnp.asarray([float(sy) for sy in sys_ for _ in sxs_], jnp.float32)
    sx_t = jnp.asarray([float(sx) for _ in sys_ for sx in sxs_], jnp.float32)

    def tile_b(g):  # (B, M, Ho, Wo) -> (B*M*K, 1, n)
        t = g.reshape(bsz * m, ny, b, nx, b).transpose(0, 1, 3, 2, 4)
        return t.reshape(bsz * m * k, 1, n)

    gyl = tile_b(gy_b) - jnp.tile(sy_t, (bsz * m,))[:, None, None]
    gxl = tile_b(gx_b) - jnp.tile(sx_t, (bsz * m,))[:, None, None]
    t_tot = bsz * m * k
    out = pl.pallas_call(
        functools.partial(wtp._fwd_kernel, wy=win, wx=win, c=c),
        grid=(t_tot,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, c, win, win),
                lambda i: ((i // (m * k)) * k + (i % k), 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_tot, c, n), jnp.float32),
    )(gyl, gxl, windows)
    return out  # (B*M*K, C, n) — untiling omitted; probe times the kernel


@jax.jit
def setup(key):
    img = jax.random.normal(key, (B, 2, H, W))
    gy = jax.random.uniform(
        key, (B, M, H, W), minval=-float(DISP), maxval=float(DISP)
    ) + jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    gx = jax.random.uniform(
        key, (B, M, H, W), minval=-float(DISP), maxval=float(DISP)
    ) + jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    return img, gy, gx


def timed(tag, make_loop, *args):
    outs = {}
    for reps in (REPS, 2 * REPS):
        f = jax.jit(make_loop(reps))
        f(*args)
        sync(f(*args))
        t0 = time.perf_counter()
        sync(f(*args))
        outs[reps] = time.perf_counter() - t0
    per = (outs[2 * REPS] - outs[REPS]) / REPS * 1000
    print(f"{tag}: {per:.2f} ms/op", flush=True)


def main():
    planes, gy, gx = setup(jax.random.PRNGKey(0))

    def folded_loop(reps):
        def f(p, gy, gx):
            def body(c, _):
                out = folded_forward(p, gy + 1e-9 * c, gx + 1e-9 * c)
                return jnp.abs(out).mean(), None

            return jax.lax.scan(body, 0.0, None, length=reps)[0]

        return f

    timed(f"folded_fwd B={B}", folded_loop, planes, gy, gx)

    # vmapped reference on the same data/kernel (no un/normalize either)
    def vmap_loop(reps):
        def one(p, gy1, gx1):
            out, _ = wtp._warp_tiled_fwd(p, gy1, gx1, TILE, False)
            return out

        def f(p, gy, gx):
            def body(c, _):
                out = jax.vmap(one)(p, gy + 1e-9 * c, gx + 1e-9 * c)
                return jnp.abs(out).mean(), None

            return jax.lax.scan(body, 0.0, None, length=reps)[0]

        return f

    timed(f"vmap_fwd   B={B}", vmap_loop, planes, gy, gx)


if __name__ == "__main__":
    main()
