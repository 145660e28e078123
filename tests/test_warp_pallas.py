"""Pallas fused-warp kernel tests (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.warp import affine_grid, identity_grid
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm
from miccai24_immoco_tpu.ops.warp_pallas import (
    bilinear_sample_pallas,
    pallas_warp_forward,
)


def test_pallas_forward_matches_mm(rng):
    h = w = 32  # N = 1024 = 2 * TILE
    import miccai24_immoco_tpu.ops.warp_pallas as wp

    old_tile = wp.TILE
    wp.TILE = 512
    try:
        img = (
            rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))
        ).astype(np.complex64)
        theta = np.eye(2, 3, dtype=np.float32)
        theta[:, :2] += 0.1 * rng.standard_normal((2, 2)).astype(np.float32)
        grids = affine_grid(jnp.asarray(theta), (h, w), align_corners=True)[None]

        ours = bilinear_sample_pallas(jnp.asarray(img), grids)
        ref = bilinear_sample_mm(jnp.asarray(img), grids)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-2, atol=2e-2
        )
    finally:
        wp.TILE = old_tile


def test_pallas_warp_gradients_flow(rng):
    import miccai24_immoco_tpu.ops.warp_pallas as wp

    old_tile = wp.TILE
    wp.TILE = 512
    try:
        h = w = 32
        img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
        grids = identity_grid((h, w))[None] * 0.9

        def loss(im, gr):
            return jnp.sum(bilinear_sample_pallas(im, gr) ** 2)

        gi, gg = jax.grad(loss, argnums=(0, 1))(img, grids)
        assert np.isfinite(np.asarray(gi)).all()
        assert np.isfinite(np.asarray(gg)).all()
        # Backward equals the XLA matmul path's gradients.
        def loss_mm(im, gr):
            return jnp.sum(bilinear_sample_mm(im, gr) ** 2)

        gi2, gg2 = jax.grad(loss_mm, argnums=(0, 1))(img, grids)
        # The cotangent flows through the bf16 forward, so per-element noise
        # is O(2^-8 * |values|); structural agreement is what is asserted.
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gi2),
                                   rtol=5e-2, atol=5e-2)
    finally:
        wp.TILE = old_tile
