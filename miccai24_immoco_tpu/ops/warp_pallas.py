"""Pallas TPU kernel: fused one-hot bilinear warp (forward). SUPERSEDED.

Superseded by ops/warp_tiled_pallas.py (warp_impl="pallas_tiled"): this
dense-K forward still crashes the remote Mosaic backend (its lane-splitting
(n, W*C) -> (n, W, C) reshape), works only in interpret mode, and has no
FLOP advantage over the tiled kernels.  Kept as the minimal reference
implementation of the one-hot-in-kernel idea.

The XLA matmul warp (ops/warp_mm.py) materializes the one-hot interpolation
matrices and the intermediate ``rows`` tensor through HBM (~0.8 GB of
traffic per movement per direction).  This kernel fuses, per point tile:

    build Ay, Ax one-hots in VMEM  ->  rows = Ay @ planes (MXU)
    ->  out = sum_x rows * Ax      (VPU epilogue)

so the only HBM traffic is grids in / samples out, with the (H, 2W) image
planes resident in VMEM across the whole grid (400 KB in bf16 at 320^2).

Used behind ``warp_impl="pallas"`` via jax.custom_vjp with the XLA matmul
backward (the backward's large matmuls are already MXU-bound; the forward
is the bandwidth-bound half).  Falls back to interpret mode on CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miccai24_immoco_tpu.ops import warp_mm

# Points processed per kernel program; multiple of the bf16 sublane tile.
TILE = 512


def _kernel(gy_ref, gx_ref, planes_ref, out_ref, *, h, w, c):
    gy = gy_ref[:]  # (TILE, 1) f32 pixel coords
    gx = gx_ref[:]
    compute = jnp.bfloat16

    def one_hot(pos, size):
        p0 = jnp.floor(pos)
        t = (pos - p0).astype(compute)
        idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
        p0i = p0.astype(jnp.int32)
        lo = (idx == p0i).astype(compute)
        hi = (idx == p0i + 1).astype(compute)
        return lo * (1.0 - t) + hi * t

    ay = one_hot(gy, h)  # (TILE, H) bf16
    ax = one_hot(gx, w)  # (TILE, W)
    rows = jax.lax.dot_general(
        ay,
        planes_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, W*C) fp32, laid out as (W, C) blocks
    rows = rows.reshape(gy.shape[0], w, c).astype(compute)
    out_ref[:] = jnp.sum(rows * ax[:, :, None], axis=1).astype(jnp.float32)


def pallas_warp_forward(
    planes: jnp.ndarray, gy: jnp.ndarray, gx: jnp.ndarray
) -> jnp.ndarray:
    """planes: (H, W, C) f32; gy/gx: (N,) f32 pixel coords -> (N, C) f32."""
    h, w, c = planes.shape
    n = gy.shape[0]
    assert n % TILE == 0, f"N={n} must be a multiple of {TILE}"
    planes_c = planes.reshape(h, w * c).astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(gy.reshape(n, 1), gx.reshape(n, 1), planes_c)


@jax.custom_vjp
def _warp_points(planes, gy, gx):
    return pallas_warp_forward(planes, gy, gx)


def _warp_points_ref(planes, gy, gx):
    """XLA reference implementation (shares warp_mm's math), used for the
    backward pass residual-free recomputation of gradients."""
    h, w, c = planes.shape
    compute = jnp.bfloat16
    ay = warp_mm._one_hot_lerp(gy, h, compute)
    ax = warp_mm._one_hot_lerp(gx, w, compute)
    rows = jax.lax.dot_general(
        ay, planes.astype(compute),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("nwc,nw->nc", rows.astype(compute), ax,
                      preferred_element_type=jnp.float32)


def _fwd(planes, gy, gx):
    return _warp_points(planes, gy, gx), (planes, gy, gx)


def _bwd(res, g):
    planes, gy, gx = res
    _, vjp = jax.vjp(_warp_points_ref, planes, gy, gx)
    return vjp(g)


_warp_points.defvjp(_fwd, _bwd)


def bilinear_sample_pallas(
    image: jnp.ndarray, grids: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Drop-in for warp_mm.bilinear_sample_mm with the Pallas forward."""
    h, w = image.shape
    m, ho, wo, _ = grids.shape
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=-1)
    else:
        planes = image[..., None]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    def warp_one(grid):
        gx = unnormalize(grid[..., 0].reshape(-1), w)
        gy = unnormalize(grid[..., 1].reshape(-1), h)
        out = _warp_points(planes, gy, gx)
        return out.reshape(ho, wo, -1)

    out = jax.lax.map(warp_one, grids)
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]
