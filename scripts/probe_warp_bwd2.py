"""Round-5 probe: isolated warp fwd+bwd and fit-like loss-chain cost.

probe_warp_glue2: full warp FORWARD (build+kernel+untile+loss) = 1.47
ms/rep at fit shapes.  Yet ablate_timing's divided-out fit numbers say the
warp adds ~35 ms/iter to the joint step.  Measure, hoist-proof (carry =
grids, so the whole chain re-executes):

  fwd_loss    — full fwd + |.|^2 loss                      (known ~1.5)
  vjp_full    — value_and_grad wrt (planes, gy, gx) of fwd_loss
  vjp_kspace  — value_and_grad of the fit-like chain: warp -> per-movement
                FFT -> masked k-space MSE (complex created inside jit)
  fwd_kspace  — the same chain forward-only

Usage: python scripts/probe_warp_bwd2.py [R]
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
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.warp import identity_grid
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
                    jnp.float32)
        + idg[None, None, :, :, 1]
    )
    gx = (
        jnp.asarray(rng.uniform(-2 * cap / W, 2 * cap / W, (B, M, H, W)),
                    jnp.float32)
        + idg[None, None, :, :, 0]
    )
    masks = jnp.asarray(
        rng.uniform(size=(B, M, 1, W)) < (1.0 / M), jnp.float32
    )
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)

    def warp_abs(pair1, gy1, gx1):
        img = jax.lax.complex(pair1[..., 0], pair1[..., 1])
        out = bilinear_sample_tiled_pallas_planes(
            img, gy1, gx1, tile_px=TILE, win_px=WIN
        )
        return jnp.sum(out.real**2 + out.imag**2)

    def warp_kspace(pair1, gy1, gx1, m1, kt1):
        img = jax.lax.complex(pair1[..., 0], pair1[..., 1])
        out = bilinear_sample_tiled_pallas_planes(
            img, gy1, gx1, tile_px=TILE, win_px=WIN
        )  # (M, H, W) complex
        k = fft2c(out)
        kc = jnp.sum(k * m1[:, :, :].astype(k.dtype), axis=0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        d = kc - kt
        return jnp.sum(d.real**2 + d.imag**2)

    def scan_force(one, n_extra):
        def run(gy, gx, pair, *extra):
            def step(c, _):
                v = jax.vmap(one)(pair, c, gx, *extra[:n_extra])
                return c * (1.0 + 1e-12), v.sum()

            _, s = jax.lax.scan(step, gy, None, length=R)
            return s.sum()

        return run

    timed("fwd_loss  ", scan_force(warp_abs, 0), gy, gx, pair)

    def vjp_full(pair1, gy1, gx1):
        l, gs = jax.value_and_grad(warp_abs, argnums=(0, 1, 2))(
            pair1, gy1, gx1
        )
        return l + sum(g.sum() for g in gs)

    timed("vjp_full  ", scan_force(vjp_full, 0), gy, gx, pair)

    timed("fwd_kspace", scan_force(warp_kspace, 2), gy, gx, pair, masks, ktgt)

    def vjp_kspace(pair1, gy1, gx1, m1, kt1):
        l, gs = jax.value_and_grad(warp_kspace, argnums=(0, 1, 2))(
            pair1, gy1, gx1, m1, kt1
        )
        return l + sum(g.sum() for g in gs)

    timed("vjp_kspace", scan_force(vjp_kspace, 2), gy, gx, pair, masks, ktgt)


if __name__ == "__main__":
    main()


def main_gsq():
    """vjp_full with sum(g*g) instead of sum(g): forces the cotangent glue
    (unslice_add for d_planes, untile1 for d_gy/d_gx) to actually
    materialize — sum(g) lets XLA collapse those chains algebraically,
    which is why the leaf probes looked fast."""
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
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)

    def warp_kspace(pair1, gy1, gx1, m1, kt1):
        img = jax.lax.complex(pair1[..., 0], pair1[..., 1])
        out = bilinear_sample_tiled_pallas_planes(
            img, gy1, gx1, tile_px=TILE, win_px=WIN
        )
        k = fft2c(out)
        k = jax.lax.optimization_barrier(k)
        kc = jnp.sum(k * m1[:, :, :].astype(k.dtype), axis=0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        d = kc - kt
        return jnp.sum(d.real**2 + d.imag**2)

    def scan_force(one):
        def run(gy, gx, pair, masks, ktgt):
            def step(c, _):
                v = jax.vmap(one)(pair, c, gx, masks, ktgt)
                return c * (1.0 + 1e-12), v.sum()

            _, s = jax.lax.scan(step, gy, None, length=R)
            return s.sum()

        return run

    for name, argnums in [
        ("gsq_pair ", (0,)),
        ("gsq_coord", (1, 2)),
        ("gsq_all  ", (0, 1, 2)),
    ]:
        def one(pair1, gy1, gx1, m1, kt1, _a=argnums):
            l, gs = jax.value_and_grad(warp_kspace, argnums=_a)(
                pair1, gy1, gx1, m1, kt1
            )
            return l + sum(jnp.sum(g * g) for g in gs)

        timed(name, scan_force(one), gy, gx, pair, masks, ktgt)
