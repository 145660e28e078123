"""Differentiable image warping with exact torch coordinate semantics.

The reference leans on ``F.affine_grid`` + ``F.grid_sample`` throughout
(immoco.py:72-76,97-107; motion_utils.py:165-182; autofocusing.py:71-85) and
*mixes* align_corners conventions: grids are built with ``align_corners=True``
and sampled with ``align_corners=False``.  SSIM parity silently drifts if the
conventions are off by half a pixel, so this module replicates torch's
coordinate math exactly (golden-tested against torch CPU in
tests/test_warp.py):

- ``affine_grid(theta, (H, W), align_corners)`` — normalized [-1, 1] sampling
  grid from a 2x3 affine; last dim is (x, y) with x indexing width.
- ``grid_sample(img, grid, mode, padding_mode, align_corners)`` — bilinear and
  bicubic (a = -0.75) resampling with "zeros" / "border" padding.

All functions are batched over leading axes via explicit (N, ...) signatures,
jit/vmap/grad-safe, and built from gathers that XLA lowers well on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _base_coords(size: int, align_corners: bool, dtype) -> jnp.ndarray:
    """Normalized base coordinates along one axis, torch convention."""
    if align_corners:
        return jnp.linspace(-1.0, 1.0, size, dtype=dtype)
    # ((2i + 1) / size) - 1
    i = jnp.arange(size, dtype=dtype)
    return (2.0 * i + 1.0) / size - 1.0


def affine_grid(
    theta: jnp.ndarray, size_hw, align_corners: bool = True
) -> jnp.ndarray:
    """Sampling grid from affine(s).

    Args:
      theta: (2, 3) or (N, 2, 3) affine matrices. Row 0 produces the output x
        coordinate, row 1 the output y coordinate (torch layout).
      size_hw: (H, W) of the output grid.
      align_corners: torch semantics for the base grid extents.

    Returns:
      (H, W, 2) or (N, H, W, 2) grid with last dim (x, y) in [-1, 1].
    """
    theta = jnp.asarray(theta)
    squeeze = theta.ndim == 2
    if squeeze:
        theta = theta[None]
    h, w = size_hw
    dtype = theta.dtype
    xs = _base_coords(w, align_corners, dtype)
    ys = _base_coords(h, align_corners, dtype)
    # Homogeneous base grid (H, W, 3): (x, y, 1).
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    # (N, H, W, 2) = base (H, W, 3) @ theta^T (N, 3, 2)
    grid = jnp.einsum("hwk,njk->nhwj", base, theta)
    return grid[0] if squeeze else grid


def identity_grid(size_hw, align_corners: bool = True, dtype=jnp.float32):
    """Identity sampling grid, as used for the Image INR query coordinates
    (reference immoco.py:72-76 builds it with align_corners=True)."""
    eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)
    return affine_grid(eye, size_hw, align_corners=align_corners)


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool):
    """[-1, 1] -> pixel index space (torch grid_sampler convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray):
    """img: (C, H, W); ix/iy: integer index arrays of identical shape.

    Indices must already be clipped to valid range; returns (C, *idx.shape).
    """
    c, h, w = img.shape
    flat = img.reshape(c, h * w)
    lin = (iy * w + ix).reshape(-1)
    out = jnp.take(flat, lin, axis=1)
    return out.reshape((c,) + ix.shape)


def _bilinear_one(img, grid, padding_mode, align_corners):
    """img: (C, H, W) real; grid: (Ho, Wo, 2) with (x, y) last dim."""
    c, h, w = img.shape
    gx = _unnormalize(grid[..., 0], w, align_corners)
    gy = _unnormalize(grid[..., 1], h, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, w - 1)
        gy = jnp.clip(gy, 0.0, h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = _gather_2d(img, xi_c, yi_c)
        if padding_mode == "zeros":
            wgt = jnp.where(inb, wgt, 0.0)
        return vals * wgt[None]

    out = (
        corner(x0, y0, (1 - tx) * (1 - ty))
        + corner(x0 + 1, y0, tx * (1 - ty))
        + corner(x0, y0 + 1, (1 - tx) * ty)
        + corner(x0 + 1, y0 + 1, tx * ty)
    )
    return out


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for taps at offsets (-1, 0, 1, 2)."""
    # Distances of the 4 taps from the sample point: 1+t, t, 1-t, 2-t.
    def near(d):  # |d| <= 1
        return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0

    def far(d):  # 1 < |d| < 2
        return ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a

    return (far(1.0 + t), near(t), near(1.0 - t), far(2.0 - t))


def _bicubic_one(img, grid, padding_mode, align_corners):
    """Bicubic (a=-0.75) sampling of (C, H, W) at (Ho, Wo, 2) grid."""
    c, h, w = img.shape
    gx = _unnormalize(grid[..., 0], w, align_corners)
    gy = _unnormalize(grid[..., 1], h, align_corners)
    # Unlike bilinear, torch's bicubic kernel does NOT clip the source
    # coordinate for border padding; it clamps each of the 16 tap indices
    # individually (aten grid_sampler get_value_bounded semantics).

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)

    out = jnp.zeros((c,) + gx.shape, dtype=img.dtype)
    for j in range(4):
        yi = y0 + (j - 1)
        row = jnp.zeros_like(out)
        for i in range(4):
            xi = x0 + (i - 1)
            inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            vals = _gather_2d(img, xi_c, yi_c)
            if padding_mode == "zeros":
                vals = vals * jnp.where(inb, 1.0, 0.0)[None]
            row = row + vals * wx[i][None]
        out = out + row * wy[j][None]
    return out


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent.

    Args:
      img: (C, H, W) or (N, C, H, W); real or complex (complex is warped as
        two real channels, matching the reference's view_as_real round-trip).
      grid: (Ho, Wo, 2) or (N, Ho, Wo, 2); last dim (x, y) in [-1, 1].
      mode: "bilinear" or "bicubic".
      padding_mode: "zeros" or "border".
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    if mode == "bilinear":
        fn = _bilinear_one
    elif mode == "bicubic":
        fn = _bicubic_one
    else:
        raise ValueError(f"unsupported mode: {mode}")

    batched = img.ndim == 4
    imgs = img if batched else img[None]
    grids = grid if grid.ndim == 4 else jnp.broadcast_to(
        grid[None], (imgs.shape[0],) + grid.shape
    )

    sample = functools.partial(
        fn, padding_mode=padding_mode, align_corners=align_corners
    )
    if jnp.iscomplexobj(imgs):
        def per_sample(im, gr):
            re = sample(im.real, gr)
            ims = sample(im.imag, gr)
            return jax.lax.complex(re, ims)

        out = jax.vmap(per_sample)(imgs, grids)
    else:
        out = jax.vmap(sample)(imgs, grids)
    return out if batched else out[0]
