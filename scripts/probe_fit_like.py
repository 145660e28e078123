"""Round-5 probe: reconstruct the in-fit warp slowness from the fast probe.

Isolated warp->fft->mask-sum vjp = 2.2 ms (barriered); the same chain
inside the real fit step adds ~35 ms/iter (two-length marginal, ablate).
Add the fit's remaining structure one piece at a time (all barriered):

  base       — warp -> fft -> mask-sum -> mse           (known 2.2)
  +dc        — + dc term: fft(image)*(1-msum), image cotangent fan-out
  +tanh      — grids produced by idg + tanh(raw)*scale
  +imgmm     — image produced by a matmul (lattice-like producer)
  +ge        — + gradient-entropy on image
  +adamscan  — whole thing inside a lax.scan with adam on the leaves
  +mean      — real_pair_mse mean instead of sum

Usage: python scripts/probe_fit_like.py [R]
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
import optax

from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy, real_pair_mse
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
    raw = jnp.asarray(
        rng.standard_normal((B, 2, M, H, W)) * 0.3, jnp.float32
    )
    u = jnp.asarray(rng.standard_normal((B, H, 64)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 64, W * 2)) * 0.1, jnp.float32)
    idg = identity_grid((H, W))
    idgy = idg[None, None, :, :, 1]
    idgx = idg[None, None, :, :, 0]
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)),
        jnp.float32,
    )
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    scale = 2.0 * 14 / W

    def make_chain(dc, tanh, imgmm, ge, mean):
        def chain(pair1, raw1, u1, v1, m1, kt1):
            if imgmm:
                img_planes = (u1 @ v1).reshape(H, W, 2) + pair1
            else:
                img_planes = pair1
            image = jax.lax.complex(img_planes[..., 0], img_planes[..., 1])
            if tanh:
                gy = idgy[0] + jnp.tanh(raw1[1]) * scale
                gx = idgx[0] + jnp.tanh(raw1[0]) * scale
            else:
                gy = idgy[0] + raw1[1] * 0.05 * scale
                gx = idgx[0] + raw1[0] * 0.05 * scale
            out = bilinear_sample_tiled_pallas_planes(
                image, gy, gx, tile_px=TILE, win_px=WIN
            )
            k_mov = jax.lax.optimization_barrier(fft2c(out))
            k = (k_mov * m1).sum(0)
            if dc:
                k = k + fft2c(image) * (1.0 - m1.sum(0))
            kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
            if mean:
                loss = real_pair_mse(k, kt)
            else:
                d = k - kt
                loss = jnp.sum(d.real**2 + d.imag**2)
            if ge:
                loss = loss + 1e-2 * gradient_entropy(image)
            return loss

        return chain

    def bench(name, chain):
        def one(raw1, pair1, u1, v1, m1, kt1):
            l, gs = jax.value_and_grad(chain, argnums=(0, 1, 2, 3))(
                pair1, raw1, u1, v1, m1, kt1
            )
            return l + sum(g.sum() for g in gs)

        def run(raw, pair, u, v, masks_b, ktgt):
            def step(c, _):
                val = jax.vmap(one)(c, pair, u, v, masks_b, ktgt)
                return c * (1.0 + 1e-12), val.sum()

            _, s = jax.lax.scan(step, raw, None, length=R)
            return s.sum()

        timed(name, run, raw, pair, u, v, masks_b, ktgt)

    bench("base     ", make_chain(False, False, False, False, False))
    bench("+dc      ", make_chain(True, False, False, False, False))
    bench("+tanh    ", make_chain(True, True, False, False, False))
    bench("+imgmm   ", make_chain(True, True, True, False, False))
    bench("+ge      ", make_chain(True, True, True, True, False))
    bench("+mean    ", make_chain(True, True, True, True, True))

    # adam + scan over iterations with params as carry (the real fit shape)
    chain = make_chain(True, True, True, True, True)
    opt = optax.adam(1e-3)

    def adamscan(raw, pair, u, v, masks_b, ktgt):
        def one_slice(raw1, pair1, u1, v1, m1, kt1):
            params = {"raw": raw1, "pair": pair1, "u": u1, "v": v1}
            state = opt.init(params)

            def step(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(
                    lambda pp: chain(pp["pair"], pp["raw"], pp["u"],
                                     pp["v"], m1, kt1)
                )(p)
                upd, s = opt.update(g, s)
                return (optax.apply_updates(p, upd), s), loss

            (_, _), losses = jax.lax.scan(
                step, (params, state), None, length=R
            )
            return losses.sum()

        return jax.vmap(one_slice)(raw, pair, u, v, masks_b, ktgt).sum()

    timed("+adamscan", adamscan, raw, pair, u, v, masks_b, ktgt)


if __name__ == "__main__":
    main()


def variants2():
    """Follow-up bisect: which part of +imgmm triggers it, and does a
    barrier after image production cure it."""
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    raw = jnp.asarray(
        rng.standard_normal((B, 2, M, H, W)) * 0.3, jnp.float32
    )
    u = jnp.asarray(rng.standard_normal((B, H, 64)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 64, W * 2)) * 0.1, jnp.float32)
    idg = identity_grid((H, W))
    idgy = idg[None, None, :, :, 1]
    idgx = idg[None, None, :, :, 0]
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)),
        jnp.float32,
    )
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    scale = 2.0 * 14 / W

    def make(img_mode):
        def chain(pair1, raw1, u1, v1, m1, kt1):
            if img_mode == "mm":
                img_planes = (u1 @ v1).reshape(H, W, 2) + pair1
            elif img_mode == "mm_barrier":
                img_planes = jax.lax.optimization_barrier(
                    (u1 @ v1).reshape(H, W, 2) + pair1
                )
            elif img_mode == "mm_cf":
                vv = v1.reshape(64, 2, W)
                pr = u1 @ vv[:, 0, :] + pair1[..., 0]
                pi = u1 @ vv[:, 1, :] + pair1[..., 1]
                img_planes = jnp.stack([pr, pi], axis=-1)
            elif img_mode == "mm_dead":
                img_planes = pair1 + 0.0 * (u1 @ v1).reshape(H, W, 2)
            gy = idgy[0] + jnp.tanh(raw1[1]) * scale
            gx = idgx[0] + jnp.tanh(raw1[0]) * scale
            image = jax.lax.complex(img_planes[..., 0], img_planes[..., 1])
            out = bilinear_sample_tiled_pallas_planes(
                image, gy, gx, tile_px=TILE, win_px=WIN
            )
            k_mov = jax.lax.optimization_barrier(fft2c(out))
            k = (k_mov * m1).sum(0) + fft2c(image) * (1.0 - m1.sum(0))
            kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
            return real_pair_mse(k, kt)

        return chain

    for name, mode in [
        ("mm        ", "mm"),
        ("mm_barrier", "mm_barrier"),
        ("mm_cf     ", "mm_cf"),
        ("mm_dead   ", "mm_dead"),
    ]:
        chain = make(mode)

        def one(raw1, pair1, u1, v1, m1, kt1, _c=chain):
            l, gs = jax.value_and_grad(_c, argnums=(0, 1, 2, 3))(
                pair1, raw1, u1, v1, m1, kt1
            )
            return l + sum(g.sum() for g in gs)

        def run(raw, pair, u, v, masks_b, ktgt, _one=one):
            def step(c, _):
                val = jax.vmap(_one)(c, pair, u, v, masks_b, ktgt)
                return c * (1.0 + 1e-12), val.sum()

            _, s = jax.lax.scan(step, raw, None, length=R)
            return s.sum()

        timed(name, run, raw, pair, u, v, masks_b, ktgt)
