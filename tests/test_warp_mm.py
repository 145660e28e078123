"""Matmul warp vs gather warp: values and gradients must agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample, identity_grid
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm


def _setup(rng, h=24, w=20, m=3):
    img = (
        rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))
    ).astype(np.complex64)
    thetas = np.tile(np.eye(2, 3, dtype=np.float32), (m, 1, 1))
    thetas[:, :, :2] += 0.15 * rng.standard_normal((m, 2, 2)).astype(np.float32)
    thetas[:, :, 2] = 0.2 * rng.standard_normal((m, 2)).astype(np.float32)
    grids = affine_grid(jnp.asarray(thetas), (h, w), align_corners=True)
    return jnp.asarray(img), grids


def test_matmul_matches_gather_complex(rng):
    img, grids = _setup(rng)
    m, h, w, _ = grids.shape
    ours = bilinear_sample_mm(img, grids, compute_dtype=jnp.float32)
    ref = grid_sample(
        jnp.broadcast_to(img[None, None], (m, 1, h, w)),
        grids,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_matmul_bf16_close(rng):
    img, grids = _setup(rng)
    m, h, w, _ = grids.shape
    a = bilinear_sample_mm(img, grids, compute_dtype=jnp.bfloat16)
    b = bilinear_sample_mm(img, grids, compute_dtype=jnp.float32)
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    assert err < 0.05 * float(jnp.abs(img).max())


def test_matmul_gradients_match_gather(rng):
    img, grids = _setup(rng, h=12, w=12, m=2)
    m, h, w, _ = grids.shape

    def loss_mm(im, gr):
        return jnp.sum(jnp.abs(bilinear_sample_mm(im, gr,
                                                  compute_dtype=jnp.float32)) ** 2)

    def loss_gather(im, gr):
        out = grid_sample(
            jnp.broadcast_to(im[None, None], (m, 1, h, w)),
            gr,
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )[:, 0]
        return jnp.sum(jnp.abs(out) ** 2)

    g1_im, g1_gr = jax.grad(loss_mm, argnums=(0, 1))(img, grids)
    g2_im, g2_gr = jax.grad(loss_gather, argnums=(0, 1))(img, grids)
    np.testing.assert_allclose(np.asarray(g1_im), np.asarray(g2_im),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1_gr), np.asarray(g2_gr),
                               rtol=1e-3, atol=1e-4)


def test_model_forward_matmul_matches_gather(rng):
    """End-to-end forward-model parity between warp implementations."""
    import dataclasses
    import sys

    sys.path.insert(0, "tests")
    from test_immoco_fit import small_cfg, synthetic_brain

    from miccai24_immoco_tpu.models.immoco import build_immoco

    img = synthetic_brain(32, 32)
    from miccai24_immoco_tpu.ops.fft import fft2c
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d

    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)

    cfg = small_cfg("lattice", "lattice", iters=3, max_movements=4)
    cfg_mm = dataclasses.replace(cfg, warp_impl="matmul", compute_dtype="float32")
    cfg_g = dataclasses.replace(cfg, warp_impl="gather")

    m1 = build_immoco(cfg_mm, 32, 32)
    m2 = build_immoco(cfg_g, 32, 32)
    params = m1.init(jax.random.PRNGKey(1))
    k1, i1 = m1.forward(params, masks, m1.statics)
    k2, i2 = m2.forward(params, masks, m2.statics)
    # bf16 one-hot weights vs f32 gather weights -> small numeric spread.
    denom = float(jnp.abs(k2).max())
    assert float(jnp.abs(k1 - k2).max()) / denom < 2e-2
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)


def test_banded_matches_dense_for_bounded_displacement(rng):
    h = w = 64
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    # Displacements bounded to ~10 px (< band 16 - 2).
    disp = 10.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((2, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]
    dense = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32)
    banded = bilinear_sample_mm(jnp.asarray(img), grids,
                                compute_dtype=jnp.float32, band_px=16)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_banded_gradients(rng):
    h = w = 32
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    disp = 4.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]

    def loss(im, band):
        return jnp.sum(
            bilinear_sample_mm(im, grids, compute_dtype=jnp.float32,
                               band_px=band) ** 2
        )

    g_b = jax.grad(lambda im: loss(im, 8))(img)
    g_d = jax.grad(lambda im: loss(im, 0))(img)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=1e-4, atol=1e-5)


def test_bicubic_matmul_matches_gather(rng):
    from miccai24_immoco_tpu.ops.warp_mm import bicubic_sample_mm

    m, h, w = 2, 20, 24
    imgs = (
        rng.standard_normal((m, h, w)) + 1j * rng.standard_normal((m, h, w))
    ).astype(np.complex64)
    thetas = np.tile(np.eye(2, 3, dtype=np.float32), (m, 1, 1))
    thetas[:, :, :2] += 0.1 * rng.standard_normal((m, 2, 2)).astype(np.float32)
    grids = affine_grid(jnp.asarray(thetas), (h, w), align_corners=True)

    ours = bicubic_sample_mm(jnp.asarray(imgs), grids,
                             compute_dtype=jnp.float32)
    ref = grid_sample(
        jnp.asarray(imgs)[:, None], grids, mode="bicubic",
        padding_mode="zeros", align_corners=False,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_border_padding_matches_gather(rng):
    h = w = 16
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    thetas = np.tile(np.eye(2, 3, dtype=np.float32), (2, 1, 1))
    thetas[:, :, 2] = 0.5 * rng.standard_normal((2, 2)).astype(np.float32)
    grids = affine_grid(jnp.asarray(thetas), (h, w), align_corners=True)
    ours = bilinear_sample_mm(jnp.asarray(img), grids,
                              compute_dtype=jnp.float32,
                              padding_mode="border")
    ref = grid_sample(
        jnp.broadcast_to(jnp.asarray(img)[None, None], (2, 1, h, w)),
        grids, mode="bilinear", padding_mode="border", align_corners=False,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tiled2d_matches_dense_for_bounded_displacement(rng):
    h = w = 64
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    # Displacements bounded to ~10 px (< tile 16 - 2), both axes.
    disp = 10.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((2, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]
    dense = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32)
    tiled = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32, tile_px=16)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_tiled2d_edge_clipping_out_of_image(rng):
    """Points displaced past the image border must reproduce zeros padding,
    including in edge tiles where the window is clipped."""
    h = w = 48
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    # Constant +-12 px shift pushes border tiles outside the image.
    disp = np.zeros((1, h, w, 2), np.float32)
    disp[..., 0] = 12.0 / (w / 2.0)
    disp[..., 1] = -12.0 / (h / 2.0)
    idg = identity_grid((h, w), align_corners=True)
    grids = jnp.asarray(disp) + idg[None]
    dense = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32)
    tiled = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32, tile_px=16)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_tiled2d_gradients(rng):
    h = w = 48
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    disp = 4.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]

    def loss(im, gr, tile):
        return jnp.sum(
            bilinear_sample_mm(im, gr, compute_dtype=jnp.float32,
                               tile_px=tile) ** 2
        )

    g_t = jax.grad(lambda im: loss(im, grids, 16))(img)
    g_d = jax.grad(lambda im: loss(im, grids, 0))(img)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_d),
                               rtol=1e-4, atol=1e-5)
    # Grid gradients (motion-INR path) must match too.
    gg_t = jax.grad(lambda gr: loss(img, gr, 16))(grids)
    gg_d = jax.grad(lambda gr: loss(img, gr, 0))(grids)
    np.testing.assert_allclose(np.asarray(gg_t), np.asarray(gg_d),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff_path(rng):
    """The hand-written matmul backward must equal XLA autodiff of the
    one-hot formulation for both image and grid gradients."""
    img, grids = _setup(rng, h=20, w=24, m=3)

    def loss(im, gr, use):
        out = bilinear_sample_mm(im, gr, compute_dtype=jnp.float32,
                                 use_custom_vjp=use)
        return jnp.sum(jnp.abs(out) ** 2)

    gc_im, gc_gr = jax.grad(lambda im, gr: loss(im, gr, True),
                            argnums=(0, 1))(img, grids)
    ga_im, ga_gr = jax.grad(lambda im, gr: loss(im, gr, False),
                            argnums=(0, 1))(img, grids)
    np.testing.assert_allclose(np.asarray(gc_im), np.asarray(ga_im),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc_gr), np.asarray(ga_gr),
                               rtol=1e-5, atol=1e-6)


def test_band_static_matches_dense_and_dynamic(rng):
    h = w = 64
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    disp = 10.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((2, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]
    dense = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32)
    static = bilinear_sample_mm(jnp.asarray(img), grids,
                                compute_dtype=jnp.float32, band_px=16)
    dynamic = bilinear_sample_mm(jnp.asarray(img), grids,
                                 compute_dtype=jnp.float32, band_px=16,
                                 band_dynamic=True)
    np.testing.assert_allclose(np.asarray(static), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(static), np.asarray(dynamic),
                               rtol=1e-5, atol=1e-6)

    def loss(im, band):
        return jnp.sum(jnp.abs(bilinear_sample_mm(
            im, grids, compute_dtype=jnp.float32, band_px=band)) ** 2)

    g_s = jax.grad(lambda im: loss(im, 16))(jnp.asarray(img))
    g_d = jax.grad(lambda im: loss(im, 0))(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-5)


def test_unrolled_matches_map(rng):
    img, grids = _setup(rng, h=20, w=24, m=3)
    a = bilinear_sample_mm(img, grids, compute_dtype=jnp.float32)
    b = bilinear_sample_mm(img, grids, compute_dtype=jnp.float32,
                           unroll=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_frozen_weights_apply_matches_tiled(rng):
    """bilinear_weights_tiled + bilinear_apply_tiled == the fused tiled warp
    (same matmul order/dtypes), values AND image-gradients."""
    from miccai24_immoco_tpu.ops.warp_mm import (
        bilinear_apply_tiled,
        bilinear_weights_tiled,
    )

    h = w = 64
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    disp = 10.0 / (w / 2.0) * jnp.tanh(
        jnp.asarray(rng.standard_normal((2, h, w, 2)).astype(np.float32))
    )
    idg = identity_grid((h, w), align_corners=True)
    grids = disp + idg[None]
    fused = bilinear_sample_mm(jnp.asarray(img), grids,
                               compute_dtype=jnp.float32, tile_px=16)
    wts = bilinear_weights_tiled(grids, h, w, tile_px=16,
                                 compute_dtype=jnp.float32)
    applied = bilinear_apply_tiled(jnp.asarray(img), wts)
    np.testing.assert_array_equal(np.asarray(applied), np.asarray(fused))

    # Image gradient: transpose matmuls of the cached weights must equal the
    # fused warp's image gradient (grids held fixed).
    def loss_fused(im):
        return jnp.sum(jnp.abs(
            bilinear_sample_mm(im, grids, compute_dtype=jnp.float32,
                               tile_px=16)
        ) ** 2)

    def loss_applied(im):
        return jnp.sum(jnp.abs(bilinear_apply_tiled(im, wts)) ** 2)

    g_fused = jax.grad(loss_fused)(jnp.asarray(img))
    g_applied = jax.grad(loss_applied)(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_applied), np.asarray(g_fused),
                               rtol=1e-5, atol=1e-6)
