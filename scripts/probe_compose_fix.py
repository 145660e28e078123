"""Round-5 probe: reformulations of the masked k-space loss backward.

w_masked (warp -> fft2c -> mask-sum -> loss) vjp = 38.7 ms where every
sub-chain is ~2 ms.  Candidate fixes, all algebraically identical for the
fit's disjoint 0/1 column masks:

  base      — (known 38.7) sum_m fft(out_m)*mask_m, loss on the sum
  barrier   — optimization_barrier between fft output and mask-sum
  realpair  — mask-sum + loss on stacked real/imag f32 planes (complex
              confined to the fft)
  disjoint  — per-movement masked residual: sum_m ||(fft(out_m)-kt)*m_m||^2
  disjoint_rp — disjoint + real-pair arithmetic

Usage: python scripts/probe_compose_fix.py [R]
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
    # Disjoint 0/1 column masks, full (M, H, W) like the fit's.
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)),
        jnp.float32,
    )  # (M, H, W)
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)

    def warp(p, gy1, gx1):
        img = jax.lax.complex(p[..., 0], p[..., 1])
        return bilinear_sample_tiled_pallas_planes(
            img, gy1, gx1, tile_px=TILE, win_px=WIN
        )

    def base(p, gy1, gx1, m1, kt1):
        k = fft2c(warp(p, gy1, gx1))
        kc = (k * m1).sum(0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        d = kc - kt
        return jnp.sum(d.real**2 + d.imag**2)

    def barrier(p, gy1, gx1, m1, kt1):
        k = fft2c(warp(p, gy1, gx1))
        k = jax.lax.optimization_barrier(k)
        kc = (k * m1).sum(0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        d = kc - kt
        return jnp.sum(d.real**2 + d.imag**2)

    def realpair(p, gy1, gx1, m1, kt1):
        k = fft2c(warp(p, gy1, gx1))
        kr = jnp.stack([k.real, k.imag], axis=-1)  # (M, H, W, 2) f32
        kc = (kr * m1[..., None]).sum(0)
        d = kc - kt1
        return jnp.sum(d * d)

    def disjoint(p, gy1, gx1, m1, kt1):
        k = fft2c(warp(p, gy1, gx1))
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        d = (k - kt[None]) * m1
        return jnp.sum(d.real**2 + d.imag**2)

    def disjoint_rp(p, gy1, gx1, m1, kt1):
        k = fft2c(warp(p, gy1, gx1))
        dr = (k.real - kt1[None, ..., 0]) * m1
        di = (k.imag - kt1[None, ..., 1]) * m1
        return jnp.sum(dr * dr) + jnp.sum(di * di)

    for name, chain in [
        ("base       ", base),
        ("barrier    ", barrier),
        ("realpair   ", realpair),
        ("disjoint   ", disjoint),
        ("disjoint_rp", disjoint_rp),
    ]:
        def one(gy1, gx1, p, m1, kt1, _c=chain):
            l, gs = jax.value_and_grad(_c, argnums=(0, 1, 2))(
                p, gy1, gx1, m1, kt1
            )
            return l + sum(g.sum() for g in gs)

        def run(gy, gx, pair, masks_b, ktgt):
            def step(c, _):
                v = jax.vmap(one)(c, gx, pair, masks_b, ktgt)
                return c * (1.0 + 1e-12), v.sum()

            _, s = jax.lax.scan(step, gy, None, length=R)
            return s.sum()

        timed(name, run, gy, gx, pair, masks_b, ktgt)


if __name__ == "__main__":
    main()
