"""Tiled Pallas warp vs the gather reference: values and gradients.

Runs in interpret mode on CPU (tests/conftest.py pins the CPU backend); the
same kernels are golden-checked on-device by scripts/probe_warp_tiled.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.warp import grid_sample, identity_grid
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm
from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
    bilinear_sample_tiled_pallas,
)

H = W = 128
TILE = 32
MAX_DISP_PX = TILE // 2 - 2  # exactness bound


def _setup(rng, m=3, disp_px=MAX_DISP_PX):
    img = (
        rng.standard_normal((H, W)) + 1j * rng.standard_normal((H, W))
    ).astype(np.complex64)
    idg = identity_grid((H, W))  # (H, W, 2) in [-1, 1], align_corners=True
    disp = rng.uniform(-1.0, 1.0, (m, H, W, 2)).astype(np.float32)
    disp[..., 0] *= 2.0 * disp_px / W
    disp[..., 1] *= 2.0 * disp_px / H
    grids = jnp.asarray(disp) + idg[None]
    return jnp.asarray(img), grids


def _gather_ref(img, grids):
    m = grids.shape[0]
    return grid_sample(
        jnp.broadcast_to(img[None, None], (m, 1, H, W)),
        grids,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    )[:, 0]


def test_forward_matches_gather(rng):
    img, grids = _setup(rng)
    ours = bilinear_sample_tiled_pallas(img, grids, tile_px=TILE)
    ref = _gather_ref(img, grids)
    scale = float(jnp.abs(img).max())
    err = np.abs(np.asarray(ours) - np.asarray(ref)).max()
    # bf16 interpolation weights: ~1e-2 relative
    assert err < 2e-2 * scale, err


def test_forward_real_input(rng):
    img, grids = _setup(rng, m=2)
    ours = bilinear_sample_tiled_pallas(img.real, grids, tile_px=TILE)
    ref = _gather_ref(img, grids).real
    err = np.abs(np.asarray(ours) - np.asarray(ref)).max()
    assert err < 2e-2, err


def test_gradients_match_gather(rng):
    img, grids = _setup(rng, m=2)
    w = jnp.asarray(
        rng.standard_normal((2, H, W)) + 1j * rng.standard_normal((2, H, W)),
        jnp.complex64,
    )

    def loss_tiled(im, gr):
        out = bilinear_sample_tiled_pallas(im, gr, tile_px=TILE)
        return jnp.sum((out * w.conj()).real)

    def loss_gather(im, gr):
        return jnp.sum((_gather_ref(im, gr) * w.conj()).real)

    gi_t, gg_t = jax.grad(loss_tiled, argnums=(0, 1))(img, grids)
    gi_r, gg_r = jax.grad(loss_gather, argnums=(0, 1))(img, grids)

    si = float(jnp.abs(gi_r).max())
    sg = float(jnp.abs(gg_r).max())
    err_i = float(jnp.abs(gi_t - gi_r).max())
    err_g = float(jnp.abs(gg_t - gg_r).max())
    assert err_i < 3e-2 * si, (err_i, si)
    assert err_g < 3e-2 * sg, (err_g, sg)


def test_matches_matmul_warp_fp32_scale(rng):
    """Sanity vs the default production path (matmul warp, bf16)."""
    img, grids = _setup(rng)
    a = bilinear_sample_tiled_pallas(img, grids, tile_px=TILE)
    b = bilinear_sample_mm(img, grids)
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    assert err < 3e-2 * float(jnp.abs(img).max()), err


def test_rejects_bad_shapes(rng):
    img, grids = _setup(rng, m=1)
    with pytest.raises(ValueError):
        bilinear_sample_tiled_pallas(img, grids[:, :40], tile_px=TILE)
    with pytest.raises(ValueError):
        bilinear_sample_tiled_pallas(img[:48], grids, tile_px=TILE)


def test_vmap_batch(rng):
    """vmap over a batch of (image, grids) — the sharded-fit usage."""
    imgs, grids = [], []
    for _ in range(2):
        i, g = _setup(rng, m=2)
        imgs.append(i)
        grids.append(g)
    imgs = jnp.stack(imgs)
    grids = jnp.stack(grids)
    out = jax.vmap(
        lambda im, gr: bilinear_sample_tiled_pallas(im, gr, tile_px=TILE)
    )(imgs, grids)
    for b in range(2):
        ref = _gather_ref(imgs[b], grids[b])
        err = np.abs(np.asarray(out[b]) - np.asarray(ref)).max()
        assert err < 2e-2 * float(jnp.abs(imgs[b]).max()), err


def test_shrunken_window_matches_gather(rng):
    """win_px < 2*tile (round-4 geometry: fewer hat elements per unit) is
    exact vs the gather reference for displacements within the tighter
    (win - tile)/2 - 2 bound, for values AND both gradients."""
    win = TILE + 16  # pad 8 -> cap 6
    img, grids = _setup(rng, m=3, disp_px=(win - TILE) // 2 - 2)
    ours = bilinear_sample_tiled_pallas(img, grids, tile_px=TILE, win_px=win)
    ref = _gather_ref(img, grids)
    scale = float(jnp.abs(img).max())
    assert np.abs(np.asarray(ours) - np.asarray(ref)).max() < 2e-2 * scale

    w = jnp.asarray(
        rng.standard_normal((3, H, W)) + 1j * rng.standard_normal((3, H, W)),
        jnp.complex64,
    )

    def loss_tiled(im, gr):
        out = bilinear_sample_tiled_pallas(im, gr, tile_px=TILE, win_px=win)
        return jnp.sum((out * w.conj()).real)

    def loss_gather(im, gr):
        return jnp.sum((_gather_ref(im, gr) * w.conj()).real)

    gi_t, gg_t = jax.grad(loss_tiled, argnums=(0, 1))(img, grids)
    gi_r, gg_r = jax.grad(loss_gather, argnums=(0, 1))(img, grids)
    assert float(jnp.abs(gi_t - gi_r).max()) < 3e-2 * float(
        jnp.abs(gi_r).max()
    )
    assert float(jnp.abs(gg_t - gg_r).max()) < 3e-2 * float(
        jnp.abs(gg_r).max()
    )


def test_shrunken_window_frozen_apply_matches(rng):
    """Frozen weights in the shrunken-window geometry reproduce the fused
    kernel bit-for-bit (the motion-frozen tail must stay bit-identical to
    the joint phase it hands off from)."""
    from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
        warp_tiled_frozen_apply,
        warp_tiled_frozen_weights,
    )

    win = TILE + 16
    img, grids = _setup(rng, m=2, disp_px=(win - TILE) // 2 - 2)
    fused = bilinear_sample_tiled_pallas(img, grids, tile_px=TILE, win_px=win)
    wts = warp_tiled_frozen_weights(
        grids[..., 1], grids[..., 0], H, W, tile_px=TILE, win_px=win
    )
    applied = warp_tiled_frozen_apply(img, wts)
    np.testing.assert_array_equal(np.asarray(applied), np.asarray(fused))


def test_rejects_bad_win(rng):
    img, grids = _setup(rng, m=1, disp_px=4)
    with pytest.raises(ValueError):  # not a multiple of 8
        bilinear_sample_tiled_pallas(img, grids, tile_px=TILE, win_px=TILE + 4)
    with pytest.raises(ValueError):  # smaller than tile + 8
        bilinear_sample_tiled_pallas(img, grids, tile_px=TILE, win_px=TILE)


def test_frozen_apply_matches_fused_kernel(rng):
    """warp_tiled_frozen_weights + warp_tiled_frozen_apply == the fused
    tiled Pallas warp (same window geometry, hat expression, matmul
    order/dtypes): forward bit-identical, image gradients matching."""
    from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
        warp_tiled_frozen_apply,
        warp_tiled_frozen_weights,
    )

    img, grids = _setup(rng, m=3)
    fused = bilinear_sample_tiled_pallas(img, grids, tile_px=TILE)
    wts = warp_tiled_frozen_weights(
        grids[..., 1], grids[..., 0], H, W, tile_px=TILE
    )
    applied = warp_tiled_frozen_apply(img, wts)
    np.testing.assert_array_equal(np.asarray(applied), np.asarray(fused))

    def loss_fused(im):
        return jnp.sum(
            jnp.abs(bilinear_sample_tiled_pallas(im, grids, tile_px=TILE))
            ** 2
        )

    def loss_applied(im):
        return jnp.sum(jnp.abs(warp_tiled_frozen_apply(im, wts)) ** 2)

    g_fused = jax.grad(loss_fused)(img)
    g_applied = jax.grad(loss_applied)(img)
    scale = float(jnp.abs(g_fused).max())
    err = np.abs(np.asarray(g_applied) - np.asarray(g_fused)).max()
    assert err < 2e-2 * scale, err
