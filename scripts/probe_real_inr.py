"""Round-5 probe: the REAL model's vjp, bisected — which producer poisons it.

probe_fit_like: stand-in INRs are fast (2.6 ms) yet the real fit step pays
~35 ms/iter for the warp path.  Here the real predict_image / sample_grids
feed the real warp + loss, outside the scan/adam, hoist-proof:

  real_full   — real image INR + real motion INR + warp + fft loss
  img_leaf    — real motion INR, image = leaf pair
  mot_leaf    — real image INR, grids from leaf raw
  img_only    — real image INR -> dc fft loss only (no warp)

Usage: python scripts/probe_real_inr.py [R] [M]
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

from miccai24_immoco_tpu.config import (
    ImageINRConfig, InstanceFitConfig, MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.losses import real_pair_mse
from miccai24_immoco_tpu.ops.warp import identity_grid
from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    bilinear_sample_tiled_pallas_planes,
)
from miccai24_immoco_tpu.utils.hostio import sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
M = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B, H, W = 4, 320, 320
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
    cfg = InstanceFitConfig(
        iters=20, max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
    )
    model = build_immoco(cfg, H, W)
    params = model.init(jax.random.PRNGKey(0))
    statics = model.statics

    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    rawm = jnp.asarray(
        rng.standard_normal((B, 2, M, H, W)) * 0.05, jnp.float32
    )
    idg = identity_grid((H, W))
    idgy = idg[None, :, :, 1]
    idgx = idg[None, :, :, 0]
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)), jnp.float32)
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    params_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(a.dtype),
        params,
    )

    def finish(image, gy, gx, m1, kt1):
        out = bilinear_sample_tiled_pallas_planes(
            image, gy, gx, tile_px=TILE, win_px=WIN
        )
        k_mov = jax.lax.optimization_barrier(fft2c(out))
        k = (k_mov * m1).sum(0) + fft2c(image) * (1.0 - m1.sum(0))
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return real_pair_mse(k, kt)

    def grids_real(p, st):
        _, gx, gy, _ = model.sample_grids(p, jnp.ones((M, H, W)), st)
        return gy, gx

    cases = {}

    def real_full(p, pair1, raw1, m1, kt1, st):
        image = model.predict_image(p, st)
        gy, gx = grids_real(p, st)
        return finish(image, gy, gx, m1, kt1)

    def img_leaf(p, pair1, raw1, m1, kt1, st):
        image = jax.lax.complex(pair1[..., 0], pair1[..., 1])
        gy, gx = grids_real(p, st)
        return finish(image, gy, gx, m1, kt1)

    def mot_leaf(p, pair1, raw1, m1, kt1, st):
        image = model.predict_image(p, st)
        gy = idgy[0][None] + raw1[1]
        gx = idgx[0][None] + raw1[0]
        return finish(image, gy, gx, m1, kt1)

    def img_only(p, pair1, raw1, m1, kt1, st):
        image = model.predict_image(p, st)
        k = fft2c(image)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return real_pair_mse(k, kt) + 0.0 * raw1.sum() + 0.0 * pair1.sum()

    for name, chain in [
        ("real_full", real_full),
        ("img_leaf ", img_leaf),
        ("mot_leaf ", mot_leaf),
        ("img_only ", img_only),
    ]:
        def one(p, pair1, raw1, m1, kt1, _c=chain):
            l, gs = jax.value_and_grad(_c, argnums=(0, 1, 2))(
                p, pair1, raw1, m1, kt1, statics
            )
            leaves = jax.tree.leaves(gs)
            return l + sum(g.sum() for g in leaves)

        def run(rawm, pair, params_b, masks_b, ktgt, _one=one):
            def step(c, _):
                val = jax.vmap(
                    lambda p, pr, rw, m1, kt: _one(p, pr, rw, m1, kt)
                )(params_b, pair, c, masks_b, ktgt)
                return c * (1.0 + 1e-12), val.sum()

            _, s = jax.lax.scan(step, rawm, None, length=R)
            return s.sum()

        timed(name, run, rawm, pair, params_b, masks_b, ktgt)


if __name__ == "__main__":
    main()


def with_adamscan():
    """The same real-model chain inside lax.scan + adam (the fit's shape)."""
    import optax

    cfg = InstanceFitConfig(
        iters=20, max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
    )
    model = build_immoco(cfg, H, W)
    params = model.init(jax.random.PRNGKey(0))
    statics = model.statics
    rng = np.random.default_rng(0)
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)), jnp.float32)
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    params_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(a.dtype),
        params,
    )
    opt = optax.adam(1e-3)
    from miccai24_immoco_tpu.ops.losses import gradient_entropy

    def loss_fn(p, m1, kt1, st, use_ge):
        k_out, image = model.forward(p, m1, st)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        loss = real_pair_mse(k_out, kt)
        if use_ge:
            loss = loss + 1e-2 * gradient_entropy(image)
        return loss

    for name, use_ge in [("adamscan_ge", True), ("adamscan   ", False)]:
        def one_slice(p, m1, kt1, _ge=use_ge):
            s0 = opt.init(p)

            def step(carry, _):
                pp, s = carry
                loss, g = jax.value_and_grad(loss_fn)(pp, m1, kt1, statics, _ge)
                u, s = opt.update(g, s)
                return (optax.apply_updates(pp, u), s), loss

            (_, _), losses = jax.lax.scan(step, (p, s0), None, length=R)
            return losses.sum()

        def run(params_b, masks_b, ktgt, _one=one_slice):
            return jax.vmap(_one)(params_b, masks_b, ktgt).sum()

        timed(name, run, params_b, masks_b, ktgt)


def main_forced():
    """main() redone with a GENUINE carry dependence: params are scaled by
    (1 + eps(carry)) so the INR evaluation cannot be hoisted.  (main()'s
    numbers were hoist artifacts: its chains ignored the carry.)"""
    cfg = InstanceFitConfig(
        iters=20, max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
    )
    model = build_immoco(cfg, H, W)
    params = model.init(jax.random.PRNGKey(0))
    statics = model.statics
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    idg = identity_grid((H, W))
    idgy = idg[None, :, :, 1]
    idgx = idg[None, :, :, 0]
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)), jnp.float32)
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    params_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(a.dtype),
        params,
    )

    def finish(image, gy, gx, m1, kt1):
        out = bilinear_sample_tiled_pallas_planes(
            image, gy, gx, tile_px=TILE, win_px=WIN
        )
        k_mov = jax.lax.optimization_barrier(fft2c(out))
        k = (k_mov * m1).sum(0) + fft2c(image) * (1.0 - m1.sum(0))
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return real_pair_mse(k, kt)

    def grids_real(p, st):
        _, gx, gy, _ = model.sample_grids(p, jnp.ones((M, H, W)), st)
        return gy, gx

    def real_full(p, pair1, m1, kt1):
        image = model.predict_image(p, statics)
        gy, gx = grids_real(p, statics)
        return finish(image, gy, gx, m1, kt1)

    def img_leaf(p, pair1, m1, kt1):
        image = jax.lax.complex(pair1[..., 0], pair1[..., 1])
        gy, gx = grids_real(p, statics)
        return finish(image, gy, gx, m1, kt1)

    def mot_zero(p, pair1, m1, kt1):
        image = model.predict_image(p, statics)
        gy = jnp.broadcast_to(idgy[0][None], (M, H, W)) * (
            1.0 + 1e-12 * jax.tree.leaves(p)[0].sum()
        )
        gx = jnp.broadcast_to(idgx[0][None], (M, H, W)) * (
            1.0 + 1e-12 * jax.tree.leaves(p)[0].sum()
        )
        return finish(image, gy, gx, m1, kt1)

    def img_only(p, pair1, m1, kt1):
        image = model.predict_image(p, statics)
        k = fft2c(image)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return real_pair_mse(k, kt)

    def mot_only(p, pair1, m1, kt1):
        gy, gx = grids_real(p, statics)
        return jnp.sum(gy * gy) + jnp.sum(gx * gx)

    for name, chain in [
        ("real_full", real_full),
        ("img_leaf ", img_leaf),
        ("mot_zero ", mot_zero),
        ("img_only ", img_only),
        ("mot_only ", mot_only),
    ]:
        def one(eps, p, pair1, m1, kt1, _c=chain):
            p = jax.tree.map(lambda a: a * (1.0 + eps), p)
            pair1 = pair1 * (1.0 + eps)
            l, gs = jax.value_and_grad(_c, argnums=(0, 1))(p, pair1, m1, kt1)
            return l + sum(g.sum() for g in jax.tree.leaves(gs))

        def run(seed, params_b, pair, masks_b, ktgt, _one=one):
            def step(c, _):
                eps = c * 1e-20
                val = jax.vmap(
                    lambda e, p, pr, m1, kt: _one(e, p, pr, m1, kt)
                )(jnp.full((B,), eps), params_b, pair, masks_b, ktgt)
                return c * (1.0 + 1e-12) + val.mean() * 1e-20, val.sum()

            _, s = jax.lax.scan(step, seed, None, length=R)
            return s.sum()

        timed(name, run, jnp.asarray(1e-3), params_b, pair, masks_b, ktgt)


def main_barrier():
    """main_forced's slow cases with optimization_barriers at the warp
    boundary (image/gy/gx inputs + warp output).  The barrier's transpose is
    itself a barrier, so this also cuts bwd-side producer fusion into the
    tiling transposes."""
    cfg = InstanceFitConfig(
        iters=20, max_movements=M,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
    )
    model = build_immoco(cfg, H, W)
    params = model.init(jax.random.PRNGKey(0))
    statics = model.statics
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    idg = identity_grid((H, W))
    idgy = idg[None, :, :, 1]
    idgx = idg[None, :, :, 0]
    cols = rng.integers(0, M, size=W)
    masks = jnp.asarray(
        (cols[None, :] == np.arange(M)[:, None])[:, None, :]
        * np.ones((1, H, 1)), jnp.float32)
    masks_b = jnp.broadcast_to(masks, (B, M, H, W))
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    params_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(a.dtype),
        params,
    )

    def finish_b(image, gy, gx, m1, kt1):
        ir, ii = jax.lax.optimization_barrier((image.real, image.imag))
        image = jax.lax.complex(ir, ii)
        gy, gx = jax.lax.optimization_barrier((gy, gx))
        out = bilinear_sample_tiled_pallas_planes(
            image, gy, gx, tile_px=TILE, win_px=WIN
        )
        out_r, out_i = jax.lax.optimization_barrier((out.real, out.imag))
        out = jax.lax.complex(out_r, out_i)
        k_mov = jax.lax.optimization_barrier(fft2c(out))
        k = (k_mov * m1).sum(0) + fft2c(image) * (1.0 - m1.sum(0))
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return real_pair_mse(k, kt)

    def grids_real(p, st):
        _, gx, gy, _ = model.sample_grids(p, jnp.ones((M, H, W)), st)
        return gy, gx

    def real_full_b(p, pair1, m1, kt1):
        image = model.predict_image(p, statics)
        gy, gx = grids_real(p, statics)
        return finish_b(image, gy, gx, m1, kt1)

    def mot_zero_b(p, pair1, m1, kt1):
        image = model.predict_image(p, statics)
        gy = jnp.broadcast_to(idgy[0][None], (M, H, W)) * (
            1.0 + 1e-12 * jax.tree.leaves(p)[0].sum()
        )
        gx = jnp.broadcast_to(idgx[0][None], (M, H, W)) * (
            1.0 + 1e-12 * jax.tree.leaves(p)[0].sum()
        )
        return finish_b(image, gy, gx, m1, kt1)

    for name, chain in [
        ("real_full_b", real_full_b),
        ("mot_zero_b ", mot_zero_b),
    ]:
        def one(eps, p, pair1, m1, kt1, _c=chain):
            p = jax.tree.map(lambda a: a * (1.0 + eps), p)
            pair1 = pair1 * (1.0 + eps)
            l, gs = jax.value_and_grad(_c, argnums=(0, 1))(p, pair1, m1, kt1)
            return l + sum(g.sum() for g in jax.tree.leaves(gs))

        def run(seed, params_b, pair, masks_b, ktgt, _one=one):
            def step(c, _):
                eps = c * 1e-20
                val = jax.vmap(
                    lambda e, p, pr, m1, kt: _one(e, p, pr, m1, kt)
                )(jnp.full((B,), eps), params_b, pair, masks_b, ktgt)
                return c * (1.0 + 1e-12) + val.mean() * 1e-20, val.sum()

            _, s = jax.lax.scan(step, seed, None, length=R)
            return s.sum()

        timed(name, run, jnp.asarray(1e-3), params_b, pair, masks_b, ktgt)
