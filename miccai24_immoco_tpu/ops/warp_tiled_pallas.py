"""Tiled Pallas TPU warp: windowed one-hot bilinear sampling on the MXU.

The dense matmul warp (ops/warp_mm.py) is exact but pays K = H matmul depth
per point: the fit step is MXU-FLOP-bound on it (PERFORMANCE.md cost model).
When the displacement field is bounded (InstanceFitConfig.motion_disp_px,
bench default 30 px), every source tap of an output pixel lies within
``pad = tile_px/2`` rows/cols of its tile, so a (tile, tile) output tile only
reads a (2*tile, 2*tile) source window: FLOPs drop by (2t)^2/(H*W) — 6.25x
at 320^2 with tile 64 — while each Pallas grid step still runs ONE large
(tile^2, 2t) @ (2t, 2t) matmul per channel, avoiding the batched-dot_general
MXU-efficiency cliff that made the pure-XLA tiled variants slower
(PERFORMANCE.md "2-D tiled warp"/"static-window banded warp" rows).

Toolchain notes (probed on this remote Mosaic backend, scripts/probe_pallas*):
- int-compare one-hot construction crashes the compiler (HTTP 500); the
  bilinear weight row is instead built as the hat function
  ``relu(1 - |iota - pos|)`` — identical weights, pure f32 elementwise.
- ``tpu.iota`` must be integer: iota int32 then cast.
- lane-splitting reshapes ((n, W*C) -> (n, W, C)) crash: per-channel 2-D ops.
- block shapes: last two dims must equal the array dims or be (8, 128)
  aligned; all blocks here use full trailing dims.
- ``pl.program_id`` is unsafe under vmap (the batch axis is PREPENDED to the
  grid): every step-dependent value arrives via index_map arithmetic or
  operands, so vmapping a batch of slice fits over this kernel is sound.

Semantics: grid_sample(bilinear, padding_mode="zeros", align_corners=False)
of a shared (H, W) image by (M, Ho, Wo, 2) normalized grids — the IM-MoCo
movement warp (reference src/models/immoco.py:97-107) — exact (up to bf16
rounding of the interpolation weights) as long as |displacement| <=
tile_px/2 - 2 pixels.  Gradient semantics match ops/warp.py's gather
reference: out-of-image taps contribute zero value AND zero coordinate
gradient; d/dcoord treats floor() as piecewise-constant.

The backward is a second Pallas kernel emitting per-tile window gradients
(reduced and un-sliced in XLA outside — static pads, no scatter) plus the
two coordinate-gradient vectors; residuals are just (planes, pixel coords),
so no rematerialization wrapper is needed around this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _hat(pos_row: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """pos_row: (1, n) window-local coords -> (n, size) bilinear weight rows.

    relu(1 - |idx - pos|) holds (1-t) at floor(pos) and t at floor(pos)+1 and
    zero elsewhere — the one-hot lerp row without integer ops.
    """
    n = pos_row.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1).astype(jnp.float32)
    pos = pos_row[0, :][:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos)).astype(dtype)


def _hat_d(pos_row: jnp.ndarray, size: int) -> jnp.ndarray:
    """d(hat)/d(pos): -1 on the floor tap (idx - pos in (-1, 0]), +1 on the
    ceil tap (idx - pos in (0, 1]), 0 outside — matches the one-hot
    formulation's (hi - lo) derivative rows (warp_mm._one_hot_pair)."""
    n = pos_row.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1).astype(jnp.float32)
    e = idx - pos_row[0, :][:, None]
    lo = jnp.where((e > -1.0) & (e <= 0.0), -1.0, 0.0)
    hi = jnp.where((e > 0.0) & (e <= 1.0), 1.0, 0.0)
    return lo + hi


def _fwd_kernel(gy_ref, gx_ref, win_ref, out_ref, *, wy, wx, c):
    ay = _hat(gy_ref[0], wy, jnp.bfloat16)  # (n, wy)
    ax = _hat(gx_ref[0], wx, jnp.float32)  # (n, wx) f32 epilogue operand
    for ci in range(c):
        rows = jax.lax.dot_general(
            ay,
            win_ref[0, ci],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, wx)
        out_ref[0, ci] = jnp.sum(rows * ax, axis=1)


def _bwd_kernel(
    gy_ref, gx_ref, win_ref, dout_ref, dwin_ref, dgy_ref, dgx_ref, *, wy, wx, c
):
    ay = _hat(gy_ref[0], wy, jnp.bfloat16)
    ax = _hat(gx_ref[0], wx, jnp.float32)
    ayd = _hat_d(gy_ref[0], wy).astype(jnp.bfloat16)
    axd = _hat_d(gx_ref[0], wx)
    n = gy_ref.shape[-1]
    dgy = jnp.zeros((n,), jnp.float32)
    dgx = jnp.zeros((n,), jnp.float32)
    for ci in range(c):
        w = win_ref[0, ci]  # (wy, wx) bf16
        do = dout_ref[0, ci]  # (n,) f32
        rows = jax.lax.dot_general(
            ay, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows_d = jax.lax.dot_general(
            ayd, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgy += jnp.sum(rows_d * ax, axis=1) * do
        dgx += jnp.sum(rows * axd, axis=1) * do
        # d_window[y, x] = sum_n ay[n, y] * ax[n, x] * do[n]
        t = (ax * do[:, None]).astype(jnp.bfloat16)  # (n, wx)
        dwin_ref[0, ci] = jax.lax.dot_general(
            ay, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dgy_ref[0, 0] = dgy
    dgx_ref[0, 0] = dgx


def _window_starts(size: int, n_tiles: int, tile: int, win: int):
    return [
        min(max(i * tile - (win - tile) // 2, 0), size - win)
        for i in range(n_tiles)
    ]


def _tile_coords(g: jnp.ndarray, ny, nx, b):
    """(M, Ho, Wo) -> (M*ny*nx, 1, b*b) in tile-major order."""
    m = g.shape[0]
    t = g.reshape(m, ny, b, nx, b).transpose(0, 1, 3, 2, 4)
    return t.reshape(m * ny * nx, 1, b * b)


def _untile(out: jnp.ndarray, m, ny, nx, b, c):
    """(T, C, n) -> (M, Ho, Wo, C)."""
    t = out.reshape(m, ny, nx, c, b, b).transpose(0, 1, 4, 2, 5, 3)
    return t.reshape(m, ny * b, nx * b, c)


def _build(planes, gy_px, gx_px, tile: int, interpret: bool):
    """Shared forward/backward preprocessing: windows + local tile coords."""
    c, h, w = planes.shape
    m, ho, wo = gy_px.shape
    b = tile
    win = 2 * tile
    ny, nx = ho // b, wo // b
    sys_ = _window_starts(h, ny, b, win)
    sxs_ = _window_starts(w, nx, b, win)
    windows = jnp.stack(
        [
            planes[:, sy : sy + win, sx : sx + win]
            for sy in sys_
            for sx in sxs_
        ]
    ).astype(jnp.bfloat16)  # (K, C, win, win)
    sy_t = jnp.asarray(
        [float(sy) for sy in sys_ for _ in sxs_], jnp.float32
    )  # (K,)
    sx_t = jnp.asarray([float(sx) for _ in sys_ for sx in sxs_], jnp.float32)
    k = ny * nx
    gyl = _tile_coords(gy_px, ny, nx, b) - jnp.tile(sy_t, (m,))[:, None, None]
    gxl = _tile_coords(gx_px, ny, nx, b) - jnp.tile(sx_t, (m,))[:, None, None]
    return windows, gyl, gxl, (c, m, ny, nx, b, win, k, sys_, sxs_)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _warp_tiled(planes, gy_px, gx_px, tile: int, interpret: bool):
    """planes (C, H, W) f32; gy/gx (M, Ho, Wo) pixel coords -> (M,Ho,Wo,C)."""
    out, _ = _warp_tiled_fwd(planes, gy_px, gx_px, tile, interpret)
    return out


def _warp_tiled_fwd(planes, gy_px, gx_px, tile, interpret):
    windows, gyl, gxl, meta = _build(planes, gy_px, gx_px, tile, interpret)
    c, m, ny, nx, b, win, k, _, _ = meta
    n = b * b
    t = m * k
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, wy=win, wx=win, c=c),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i: (i % k, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, c, n), jnp.float32),
        interpret=interpret,
    )(gyl, gxl, windows)
    return _untile(out, m, ny, nx, b, c), (planes, gy_px, gx_px)


def _warp_tiled_bwd(tile, interpret, res, d_out):
    planes, gy_px, gx_px = res
    windows, gyl, gxl, meta = _build(planes, gy_px, gx_px, tile, interpret)
    c, m, ny, nx, b, win, k, sys_, sxs_ = meta
    n = b * b
    t = m * k
    d_tiled = (
        d_out.reshape(m, ny, b, nx, b, c)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(t, c, n)
        .astype(jnp.float32)
    )
    d_win, d_gyl, d_gxl = pl.pallas_call(
        functools.partial(_bwd_kernel, wy=win, wx=win, c=c),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i: (i % k, 0, 0, 0)),
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, win, win), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c, win, win), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(gyl, gxl, windows, d_tiled)

    # Window grads: reduce over movements, then un-slice (static pads).
    d_win_k = d_win.reshape(m, k, c, win, win).sum(0)
    d_planes = jnp.zeros_like(planes)
    ki = 0
    for sy in sys_:
        for sx in sxs_:
            d_planes = d_planes.at[:, sy : sy + win, sx : sx + win].add(
                d_win_k[ki]
            )
            ki += 1

    def untile1(x):  # (T, 1, n) -> (M, Ho, Wo)
        return _untile(x.reshape(t, 1, n), m, ny, nx, b, 1)[..., 0]

    return d_planes, untile1(d_gyl), untile1(d_gxl)


_warp_tiled.defvjp(_warp_tiled_fwd, _warp_tiled_bwd)


def bilinear_sample_tiled_pallas(
    image: jnp.ndarray,
    grids: jnp.ndarray,
    align_corners: bool = False,
    tile_px: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for warp_mm.bilinear_sample_mm (zeros padding) with the tiled
    Pallas kernels.  Exact iff every grid displacement from the identity is
    <= tile_px/2 - 2 pixels (config-gated via motion_disp_px)."""
    h, w = image.shape
    m, ho, wo, _ = grids.shape
    if ho % tile_px or wo % tile_px:
        raise ValueError(f"({ho},{wo}) not divisible by tile_px={tile_px}")
    if h < 2 * tile_px or w < 2 * tile_px:
        raise ValueError(f"image smaller than window 2*tile_px={2*tile_px}")
    if interpret is None:
        interpret = _interpret_default()
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=0)  # (2, H, W)
    else:
        planes = image[None]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    gx = unnormalize(grids[..., 0], w)
    gy = unnormalize(grids[..., 1], h)
    out = _warp_tiled(planes, gy, gx, tile_px, interpret)  # (M, Ho, Wo, C)
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]
