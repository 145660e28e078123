"""Round-5 probe: which composition step makes warp+fft backward 38.7 ms?

warp-alone vjp 2.2 ms, fft-chain-alone vjp 1.25 ms, composed 38.7 ms.
Walk the composition (all hoist-proof, carry = grids):

  w_abs     — warp -> complex -> |.|^2                       (known 2.2)
  w_shift   — warp -> complex -> fftshift pair -> loss
  w_fft     — warp -> complex -> fftn raw -> loss
  w_fft2c   — warp -> complex -> fft2c -> loss
  w_masked  — warp -> complex -> fft2c -> mask-sum -> loss   (known 38.7)
  w_fft2c_real — warp -> PAIR fft via two real ffts?  no: fftn of planes
  w_msum    — warp -> complex -> mask-sum over M (no fft) -> loss

Usage: python scripts/probe_compose_bwd.py [R]
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

from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.warp import identity_grid
from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    bilinear_sample_tiled_pallas_planes,
)
from miccai24_immoco_tpu.utils.hostio import sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B, M, H, W = 4, 8, 320, 320
TILE, WIN = 64, 96


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    cap = 14
    idg = identity_grid((H, W))
    gy = (
        jnp.asarray(rng.uniform(-2 * cap / H, 2 * cap / H, (B, M, H, W)),
                    jnp.float32) + idg[None, None, :, :, 1]
    )
    gx = (
        jnp.asarray(rng.uniform(-2 * cap / W, 2 * cap / W, (B, M, H, W)),
                    jnp.float32) + idg[None, None, :, :, 0]
    )
    masks = jnp.asarray(
        rng.uniform(size=(B, M, 1, W)) < (1.0 / M), jnp.float32
    )

    def warp(p, gy1, gx1):
        img = jax.lax.complex(p[..., 0], p[..., 1])
        return bilinear_sample_tiled_pallas_planes(
            img, gy1, gx1, tile_px=TILE, win_px=WIN
        )  # (M, H, W) complex

    def loss_c(z):
        return jnp.sum(z.real**2 + z.imag**2)

    chains = {
        "w_abs   ": lambda p, gy1, gx1, m1: loss_c(warp(p, gy1, gx1)),
        "w_shift ": lambda p, gy1, gx1, m1: loss_c(
            jnp.fft.fftshift(
                jnp.fft.ifftshift(warp(p, gy1, gx1), axes=(-2, -1)),
                axes=(-2, -1),
            )
        ),
        "w_fft   ": lambda p, gy1, gx1, m1: loss_c(
            jnp.fft.fftn(warp(p, gy1, gx1), axes=(-2, -1))
        ),
        "w_fft2c ": lambda p, gy1, gx1, m1: loss_c(
            fft2c(warp(p, gy1, gx1))
        ),
        "w_msum  ": lambda p, gy1, gx1, m1: loss_c(
            jnp.sum(warp(p, gy1, gx1) * m1.astype(jnp.complex64), axis=0)
        ),
        "w_masked": lambda p, gy1, gx1, m1: loss_c(
            jnp.sum(
                fft2c(warp(p, gy1, gx1)) * m1.astype(jnp.complex64), axis=0
            )
        ),
    }

    for name, chain in chains.items():
        def one(gy1, gx1, p, m1, _c=chain):
            l, gs = jax.value_and_grad(_c, argnums=(0, 1, 2))(p, gy1, gx1, m1)
            return l + sum(g.sum() for g in gs)

        def run(gy, gx, pair, masks):
            def step(c, _):
                v = jax.vmap(one)(c, gx, pair, masks)
                return c * (1.0 + 1e-12), v.sum()

            _, s = jax.lax.scan(step, gy, None, length=R)
            return s.sum()

        timed(name, run, gy, gx, pair, masks)


if __name__ == "__main__":
    main()
