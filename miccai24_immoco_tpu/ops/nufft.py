"""Kaiser-Bessel NUFFT (type-2 interpolate / type-1 adjoint gridding).

Re-implements the capability of the reference's pytorch_nufft package
(src/utils/pytorch_nufft/nufft.py:10-75, interp.py:7-105, util.py:24-46),
needed by the AF+ baseline for differentiable k-space rotation
(src/models/af_plus.py:21-32).  Numeric conventions kept identical:

- KB kernel table: n=128 samples of i0(beta*sqrt(1-x^2))/width, linearly
  interpolated with the reference's edge masking (interp.py:38-49)
- beta = pi * sqrt((width/oversamp * (oversamp-0.5))^2 - 0.8)
- 2/3/5-smooth ("ugly") oversampled grid sizes (nufft.py:100-121)
- sinh-form apodization (nufft.py:127-137)
- scaling: coords scaled per-dim by os_i/i and shifted os_i//2; adjoint
  output scaled by prod(os)/sqrt(prod(out)) (nufft.py:66-68)
- the tap window loops y, x in [0, width] (width+1 taps per dim)

One deliberate divergence (documented; SURVEY.md §7): the reference's
gridding accumulates with ``update[yy, xx] = w*v; output += update`` per tap
(interp.py:96-103), which silently drops same-cell collisions *within* a
tap.  Here gridding is a true scatter-add (``.at[].add``) — the
mathematically correct adjoint, which is also what XLA lowers efficiently.

All functions are jit/vmap/grad-safe; the tap loop is a static Python loop
(25 taps for width=4) of vectorized gathers/scatters.

Two interpolation/gridding backends (``mode=``):

- ``"scatter"`` — vectorized gather / scatter-add taps (CPU-friendly).
- ``"matmul"`` — the KB window is separable, so gridding is ONE dense
  matmul ``Ky^T @ (Kx * values)`` with per-axis one-hot KB row matrices,
  and interpolation is ``rowsum((Ky @ grid) * Kx)`` — the same one-hot
  pattern as ops/warp_mm (gathers/scatters are catastrophically slow on
  the target TPU; dense matmuls run MXU-saturated).  Mathematically
  identical to the scatter path (unit-tested); ~524 GFLOP per call at
  AF+'s oversamp=5 (1600^2 grid), ~5 ms on a v5e MXU.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ugly_number(n: float) -> int:
    """Smallest 2/3/5-smooth integer >= n (reference nufft.py:100-121)."""
    if n <= 1:
        return int(n)
    ugly = [1]
    i2 = i3 = i5 = 0
    while True:
        nxt = min(ugly[i2] * 2, ugly[i3] * 3, ugly[i5] * 5)
        if nxt >= n:
            return nxt
        ugly.append(nxt)
        if nxt == ugly[i2] * 2:
            i2 += 1
        if nxt == ugly[i3] * 3:
            i3 += 1
        if nxt == ugly[i5] * 5:
            i5 += 1


def _beta(width: float, oversamp: float) -> float:
    return math.pi * (((width / oversamp) * (oversamp - 0.5)) ** 2 - 0.8) ** 0.5


def kb_kernel_table(n: int, width: float, beta: float) -> jnp.ndarray:
    x = np.arange(n) / n
    table = np.i0(beta * np.sqrt(1.0 - x**2)) / width
    return jnp.asarray(table.astype(np.float32))


def _lin_interp_kernel(table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Reference lin_interpolate (interp.py:38-49): zero outside x>=1 and at
    the last table cell."""
    n = table.shape[0]
    mask = (x < 1.0).astype(x.dtype)
    xc = x * mask
    idx = jnp.floor(xc * n)
    frac = xc * n - idx
    mask2 = (idx != (n - 1)).astype(x.dtype)
    idx = (idx * mask2).astype(jnp.int32)
    left = table[idx]
    right = table[idx + 1]
    return ((1.0 - frac) * left + frac * right) * mask * mask2


def _apodize(x: jnp.ndarray, ndim: int, oversamp: float, width: float, beta: float):
    out = x
    for a in range(-ndim, 0):
        i = out.shape[a]
        os_i = ugly_number(oversamp * i)
        idx = np.arange(i, dtype=np.float32)
        apod = np.sqrt(beta**2 - (np.pi * width * (idx - i // 2) / os_i) ** 2)
        apod = apod / np.sinh(apod)
        shape = [i] + [1] * (-a - 1)
        out = out * jnp.asarray(apod.reshape(shape))
    return out


def _scale_coord(coord: jnp.ndarray, shape, oversamp: float) -> jnp.ndarray:
    ndim = coord.shape[-1]
    scale = jnp.asarray(
        [ugly_number(oversamp * i) / i for i in shape[-ndim:]], jnp.float32
    )
    shift = jnp.asarray(
        [ugly_number(oversamp * i) // 2 for i in shape[-ndim:]], jnp.float32
    )
    return coord * scale + shift


def _center_crop_or_pad(x: jnp.ndarray, oshape: Sequence[int]) -> jnp.ndarray:
    """util.resize semantics (util.py:24-46): center-aligned copy."""
    out = jnp.zeros(tuple(oshape), x.dtype)
    islice, oslice = [], []
    for i, o in zip(x.shape, oshape):
        si = max(i // 2 - o // 2, 0)
        so = max(o // 2 - i // 2, 0)
        c = min(i - si, o - so)
        islice.append(slice(si, si + c))
        oslice.append(slice(so, so + c))
    return out.at[tuple(oslice)].set(x[tuple(islice)])


def _axis_kb_onehot(
    k: jnp.ndarray, n_axis: int, width: float, table: jnp.ndarray, dtype
) -> jnp.ndarray:
    """(N,) scaled coords -> (N, n_axis) KB window rows: weight w_d at
    column mod(ceil(k - width/2) + d, n_axis) for d in [0, width]."""
    k0 = jnp.ceil(k - width / 2.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], n_axis), 1)
    out = jnp.zeros((k.shape[0], n_axis), dtype)
    for d in range(int(width) + 1):
        w = _lin_interp_kernel(table, jnp.abs(k0 + d - k) / (width / 2.0))
        pos = jnp.mod(k0 + d, n_axis).astype(jnp.int32)[:, None]
        out = out + (iota == pos).astype(dtype) * w.astype(dtype)[:, None]
    return out


def nufft2(
    image: jnp.ndarray,
    coord: jnp.ndarray,
    oversamp: float = 1.25,
    width: float = 4.0,
    n: int = 128,
    mode: str = "scatter",
) -> jnp.ndarray:
    """Type-2 NUFFT: (H, W) image -> values at (npts, 2) k-coords
    ((y, x), centered at 0). Reference nufft() (nufft.py:10-40)."""
    ndim = 2
    beta = _beta(width, oversamp)
    h, w = image.shape
    os_shape = (ugly_number(oversamp * h), ugly_number(oversamp * w))

    out = _apodize(image, ndim, oversamp, width, beta)
    out = out / math.sqrt(h * w)
    out = _center_crop_or_pad(out, os_shape)
    out = jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(out, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )

    c = _scale_coord(coord, (h, w), oversamp)
    table = kb_kernel_table(n, width, beta)
    ky, kx = c[:, 0], c[:, 1]
    ny, nx = os_shape

    if mode == "matmul":
        k_y = _axis_kb_onehot(ky, ny, width, table, jnp.float32)
        k_x = _axis_kb_onehot(kx, nx, width, table, jnp.float32)
        # rows[p, x] = sum_y Ky[p, y] grid[y, x]; vals = sum_x rows * Kx.
        rows_re = jax.lax.dot_general(
            k_y, out.real, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows_im = jax.lax.dot_general(
            k_y, out.imag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.complex(
            jnp.einsum("px,px->p", rows_re, k_x),
            jnp.einsum("px,px->p", rows_im, k_x),
        )

    y0 = jnp.ceil(ky - width / 2.0)
    x0 = jnp.ceil(kx - width / 2.0)
    vals = jnp.zeros((coord.shape[0],), out.dtype)
    for dy in range(int(width) + 1):
        wy = _lin_interp_kernel(table, jnp.abs(y0 + dy - ky) / (width / 2.0))
        yy = jnp.mod(y0 + dy, ny).astype(jnp.int32)
        for dx in range(int(width) + 1):
            wgt = wy * _lin_interp_kernel(
                table, jnp.abs(x0 + dx - kx) / (width / 2.0)
            )
            xx = jnp.mod(x0 + dx, nx).astype(jnp.int32)
            vals = vals + wgt * out[yy, xx]
    return vals


def nufft_adjoint(
    values: jnp.ndarray,
    coord: jnp.ndarray,
    out_shape: Tuple[int, int],
    oversamp: float = 1.25,
    width: float = 4.0,
    n: int = 128,
    mode: str = "scatter",
    chunk: int = 0,
) -> jnp.ndarray:
    """Type-1 (adjoint) NUFFT: values at (npts, 2) coords -> (H, W) image.

    Reference nufft_adjoint (nufft.py:43-75) with correct scatter-add
    gridding (see module docstring).
    """
    ndim = 2
    beta = _beta(width, oversamp)
    h, w = out_shape
    os_shape = (ugly_number(oversamp * h), ugly_number(oversamp * w))
    ny, nx = os_shape

    c = _scale_coord(coord, (h, w), oversamp)
    table = kb_kernel_table(n, width, beta)
    ky, kx = c[:, 0], c[:, 1]

    if mode == "matmul" and chunk:
        # Chunked gridding: the full per-axis KB one-hot matrices are
        # (N, os_grid) f32 — 625 MB each at 320^2 x oversamp 5 — which blows
        # HBM inside the AF+ bilevel training unroll (each inner iteration's
        # forward + inner gradient holds several at once).  Accumulating the
        # grid over point chunks keeps peak memory at the chunk size with
        # identical math and MXU-bound matmuls (K = chunk stays large).
        # Non-divisible point counts are zero-value padded to a chunk
        # multiple (padded points contribute v=0 to the accumulation), so the
        # peak-memory control holds for every npts — previously this case
        # silently fell through to the unchunked path and OOMed at exactly
        # the scales chunking exists for.
        npts = values.shape[0]
        pad = (-npts) % chunk
        if pad:
            ky = jnp.concatenate([ky, jnp.zeros((pad,), ky.dtype)])
            kx = jnp.concatenate([kx, jnp.zeros((pad,), kx.dtype)])
            values = jnp.concatenate(
                [values, jnp.zeros((pad,), values.dtype)]
            )
        nc = values.shape[0] // chunk

        @jax.checkpoint
        def body(acc, args):
            # Rematerialized: without it the scan's vjp STACKS each chunk's
            # KB one-hot matrices as residuals — reconstituting the full
            # (N, os_grid) buffers the chunking exists to avoid.
            kyc, kxc, vre, vim = args
            k_y = _axis_kb_onehot(kyc, ny, width, table, jnp.float32)
            k_x = _axis_kb_onehot(kxc, nx, width, table, jnp.float32)

            def _grid(v):
                return jax.lax.dot_general(
                    k_y, k_x * v[:, None], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return (acc[0] + _grid(vre), acc[1] + _grid(vim)), None

        (g_re, g_im), _ = jax.lax.scan(
            body,
            (jnp.zeros(os_shape, jnp.float32), jnp.zeros(os_shape, jnp.float32)),
            (
                ky.reshape(nc, chunk),
                kx.reshape(nc, chunk),
                values.real.reshape(nc, chunk),
                values.imag.reshape(nc, chunk),
            ),
        )
        grid = jax.lax.complex(g_re, g_im)
    elif mode == "matmul":
        k_y = _axis_kb_onehot(ky, ny, width, table, jnp.float32)
        k_x = _axis_kb_onehot(kx, nx, width, table, jnp.float32)
        # grid[u, v] = sum_p Ky[p, u] * values[p] * Kx[p, v]
        def _grid(v):
            return jax.lax.dot_general(
                k_y, k_x * v[:, None], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        grid = jax.lax.complex(_grid(values.real), _grid(values.imag))
    else:
        y0 = jnp.ceil(ky - width / 2.0)
        x0 = jnp.ceil(kx - width / 2.0)
        grid = jnp.zeros(os_shape, values.dtype)
        for dy in range(int(width) + 1):
            wy = _lin_interp_kernel(
                table, jnp.abs(y0 + dy - ky) / (width / 2.0)
            )
            yy = jnp.mod(y0 + dy, ny).astype(jnp.int32)
            for dx in range(int(width) + 1):
                wgt = wy * _lin_interp_kernel(
                    table, jnp.abs(x0 + dx - kx) / (width / 2.0)
                )
                xx = jnp.mod(x0 + dx, nx).astype(jnp.int32)
                grid = grid.at[yy, xx].add(wgt * values)

    out = jnp.fft.fftshift(
        jnp.fft.ifftn(jnp.fft.ifftshift(grid, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )
    out = _center_crop_or_pad(out, out_shape)
    out = out * (float(ny * nx) / math.sqrt(float(h * w)))
    return _apodize(out, ndim, oversamp, width, beta)
