"""Tiled Pallas TPU warp: windowed one-hot bilinear sampling on the MXU.

The dense matmul warp (ops/warp_mm.py) is exact but pays K = H matmul depth
per point: the fit step is MXU-FLOP-bound on it (PERFORMANCE.md cost model).
When the displacement field is bounded (InstanceFitConfig.motion_disp_px,
bench default 30 px), every source tap of an output pixel lies within
``pad = tile_px/2`` rows/cols of its tile, so a (tile, tile) output tile only
reads a (2*tile, 2*tile) source window: FLOPs drop by (2t)^2/(H*W) — 6.25x
at 320^2 with tile 64 — while each Pallas grid step still runs large
(tile^2, 2t) @ (2t, 2t) matmuls, avoiding the batched-dot_general
MXU-efficiency cliff that made the pure-XLA tiled variants slower
(PERFORMANCE.md "2-D tiled warp"/"static-window banded warp" rows).

Grid layout: ONE grid step per source window (K = (H/t)*(W/t) steps), with
the movement loop UNROLLED INSIDE the kernel.  The first cut (one step per
(movement, tile) pair) measured ~16 us/step against ~3.5 us of VPU+MXU work
— per-step pipeline overhead dominated — so amortizing it over the M
movements that share a window is ~3x (scripts/probe_warp_fold.py history).
This also lets the backward accumulate the window gradient across movements
in VMEM and write it once (no XLA-side reduction).

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

The backward is a second Pallas kernel accumulating each window's gradient
across its movements in VMEM (un-sliced in XLA outside — static pads, no
scatter) plus the coordinate gradients; residuals are the forward's window
stack + window-local coords (a few MB), so no rematerialization wrapper is
needed around this op and the backward rebuilds nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Round-5 Mosaic tuning, probed on this backend (PERFORMANCE.md round 5):
# - dimension_semantics lets Mosaic pipeline grid steps; the movement axis
#   of the backward is "arbitrary" (d_win accumulates across it in VMEM),
#   everything else is parallel.
# - vmem_limit_bytes raises the default 16 MB scoped-VMEM cap (v5e has
#   128 MB); movement-stacked blocks (mov_chunk > 1) and the XH variant
#   need it.  The FUSED default kernels run WITHOUT compiler_params: both
#   knobs measured perf-neutral there and the scheduling change perturbs
#   the tuned bench configs at the 1e-3 ssim level.
_VMEM_LIMIT = 100 * 1024 * 1024
# (fwd_cap, bwd_cap) in rows*win elements for _mov_chunks; (0, 0) = mc=1.
_MC_CAPS = (0, 0)


def _cparams(*sem):
    return pltpu.CompilerParams(
        dimension_semantics=sem, vmem_limit_bytes=_VMEM_LIMIT
    )


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _hat(pos: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """pos: (n,) window-local coords -> (n, size) bilinear weight rows.

    relu(1 - |idx - pos|) holds (1-t) at floor(pos) and t at floor(pos)+1 and
    zero elsewhere — the one-hot lerp row without integer ops.
    """
    n = pos.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[:, None])).astype(dtype)


def _hat_d(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """d(hat)/d(pos): -1 on the floor tap (idx - pos in (-1, 0]), +1 on the
    ceil tap (idx - pos in (0, 1]), 0 outside — matches the one-hot
    formulation's (hi - lo) derivative rows (warp_mm._one_hot_pair)."""
    n = pos.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1).astype(jnp.float32)
    e = idx - pos[:, None]
    lo = jnp.where((e > -1.0) & (e <= 0.0), -1.0, 0.0)
    hi = jnp.where((e > 0.0) & (e <= 1.0), 1.0, 0.0)
    return lo + hi


def _fwd_kernel(gy_ref, gx_ref, win_ref, out_ref, *, wy, wx, c):
    # Grid (K windows, M movements), movements innermost: the window block
    # is statically indexed by the window axis only, so it stays resident
    # in VMEM across its M consecutive steps, and every other block is a
    # small statically-indexed per-(window, movement) slab.  Measured
    # equivalents and dead ends (scripts/probe_warp_tiled.py history):
    # dynamic sublane loads/stores and fori-loop movement loops are several
    # times slower; Python-unrolled movement chunks blow the 16 MB
    # scoped-VMEM limit (Mosaic keeps every unrolled iteration's
    # temporaries live) or SIGKILL the remote compile helper; a
    # movement-only grid with an in-kernel fori over windows matches this
    # design's forward but cannot fit the backward in VMEM.  All variants
    # converge to ~18 us per (movement, window) unit: the kernel is
    # VPU-bound on hat/weight construction, not MXU- or overhead-bound.
    ay = _hat(gy_ref[0, 0, 0, :], wy, jnp.bfloat16)
    ax = _hat(gx_ref[0, 0, 0, :], wx, jnp.bfloat16)
    for ci in range(c):
        rows = jax.lax.dot_general(
            ay,
            win_ref[0, ci],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (n, wx)
        out_ref[0, 0, ci, :] = jnp.sum(rows * ax, axis=1, dtype=jnp.float32)


def _bwd_kernel(
    first_ref, gy_ref, gx_ref, win_ref, dout_ref, dwin_ref, dgy_ref, dgx_ref,
    *, wy, wx, c
):
    gy = gy_ref[0, 0, 0, :]
    gx = gx_ref[0, 0, 0, :]
    ay = _hat(gy, wy, jnp.bfloat16)
    ax = _hat(gx, wx, jnp.bfloat16)
    ayd = _hat_d(gy, wy).astype(jnp.bfloat16)
    axd = _hat_d(gx, wx).astype(jnp.bfloat16)
    n = gy.shape[0]
    dgy = jnp.zeros((n,), jnp.float32)
    dgx = jnp.zeros((n,), jnp.float32)
    # Movement axis is the innermost grid dim and dwin_ref's index_map
    # ignores it, so the (c, wy, wx) f32 window-gradient block stays VMEM-
    # resident across a window's M consecutive steps: the reduction over
    # movements happens IN the kernel and the block is written back once
    # per window (the old variant emitted per-(window, movement) bf16
    # blocks, M x the bytes, reduced in XLA outside — measured ~2x slower
    # end-to-end at fit shapes).  First-visit init cannot use
    # pl.program_id (the batch axis is PREPENDED to the grid under vmap);
    # instead a (M, 1, n) flag operand indexed by the movement axis drives
    # a select — where() and not flag-multiply, so uninitialized-VMEM NaN
    # garbage cannot propagate.
    first = first_ref[0, 0, 0] > 0.5
    for ci in range(c):
        w = win_ref[0, ci]  # (wy, wx) bf16
        do = dout_ref[0, 0, ci, :]  # (n,) f32
        rows = jax.lax.dot_general(
            ay, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        rows_d = jax.lax.dot_general(
            ayd, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        dgy += jnp.sum(rows_d * ax, axis=1, dtype=jnp.float32) * do
        dgx += jnp.sum(rows * axd, axis=1, dtype=jnp.float32) * do
        # d_window[y, x] = sum_n ay[n, y] * ax[n, x] * do[n], accumulated
        # over the movement steps that share this window.
        t = (ax * do[:, None]).astype(jnp.bfloat16)  # (n, wx)
        contrib = jax.lax.dot_general(
            ay, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        prev = jnp.where(first, jnp.zeros_like(contrib), dwin_ref[0, ci])
        dwin_ref[0, ci] = prev + contrib
    dgy_ref[0, 0, 0, :] = dgy.astype(jnp.bfloat16)
    dgx_ref[0, 0, 0, :] = dgx.astype(jnp.bfloat16)


def _window_starts(size: int, n_tiles: int, tile: int, win: int):
    return [
        min(max(i * tile - (win - tile) // 2, 0), size - win)
        for i in range(n_tiles)
    ]


def _tile_coords(g: jnp.ndarray, ny, nx, b):
    """(M, Ho, Wo) -> (K, M, 1, b*b): window-major, movements inner."""
    m = g.shape[0]
    t = g.reshape(m, ny, b, nx, b).transpose(1, 3, 0, 2, 4)
    return t.reshape(ny * nx, m, 1, b * b)


def _untile(out: jnp.ndarray, m, ny, nx, b, c):
    """(K, M, C, n) -> (M, Ho, Wo, C)."""
    t = out.reshape(ny, nx, m, c, b, b).transpose(2, 0, 4, 1, 5, 3)
    return t.reshape(m, ny * b, nx * b, c)


def _build(planes, gy_px, gx_px, tile: int, win: int):
    """Shared forward/backward preprocessing: windows + local tile coords."""
    c, h, w = planes.shape
    m, ho, wo = gy_px.shape
    b = tile
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
    gyl = _tile_coords(gy_px, ny, nx, b) - sy_t[:, None, None, None]
    gxl = _tile_coords(gx_px, ny, nx, b) - sx_t[:, None, None, None]
    return windows, gyl, gxl, (c, m, ny, nx, b, win, sys_, sxs_)


def _mov_chunks(m: int, n: int, win: int, n_hats: int) -> int:
    """Largest divisor of ``m`` whose stacked-row kernel fits the 16 MB
    scoped-VMEM budget.  Peak estimate per grid step (bytes):
    n_hats bf16 hat matrices + one f32 matmul intermediate + two bf16
    row temporaries, all (mc*n, win).  Round-5: stacking mc movements
    into the matmul ROW dimension (shared window = shared rhs) divides
    the grid-step count by mc at identical total FLOPs — and the
    per-grid-step launch floor (~18 us on this backend, see
    scripts/probe_step_overhead.py / probe_hat_cost2.py: the kernel
    *computation* is ~1.5 us/step) is the fit's real warp cost."""
    # Round-5 outcome: stacking is implemented, compiles (fwd mc=4 /
    # bwd mc=2 with the raised vmem limit; mc=8 fwd SIGKILLs the remote
    # compiler) and is CPU-oracle bit-exact per row — but measured NEUTRAL
    # in the fit (the floor is per-ROW VPU hat work, invariant to step
    # count; PERFORMANCE.md round 5) while the stacked backward's dwin
    # contraction order perturbs the tuned 115-iter bench at the 1e-3 ssim
    # level.  Default therefore pins mc=1 (bit-identical to the historical
    # kernels); the machinery stays for geometries where launch count ever
    # matters (set via _MC_CAPS).
    cap = _MC_CAPS[0] if n_hats <= 2 else _MC_CAPS[1]
    for mc in range(m, 0, -1):
        if m % mc:
            continue
        if mc * n * win <= cap:
            return mc
    return 1


def _stack_mov(a: jnp.ndarray, mc: int) -> jnp.ndarray:
    """(K, M, 1, n) -> (K, M/mc, 1, mc*n): contiguity-preserving reshape
    (movement-major within a chunk), so Mosaic sees mc-fold longer rows."""
    k, m, _, n = a.shape
    return a.reshape(k, m // mc, 1, mc * n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp_tiled(planes, gy_px, gx_px, tile: int, win: int, interpret: bool):
    """planes (C, H, W) f32; gy/gx (M, Ho, Wo) pixel coords -> (M,Ho,Wo,C)."""
    out, _ = _warp_tiled_fwd(planes, gy_px, gx_px, tile, win, interpret)
    return out


def _warp_tiled_fwd(planes, gy_px, gx_px, tile, win, interpret):
    windows, gyl, gxl, meta = _build(planes, gy_px, gx_px, tile, win)
    c, m, ny, nx, b, win, _, _ = meta
    n = b * b
    k = ny * nx
    mc = _mov_chunks(m, n, win, n_hats=2)
    mcn = mc * n
    mch = m // mc
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, wy=win, wx=win, c=c),
        grid=(k, mch),
        in_specs=[
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, mcn), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, mch, c, mcn), jnp.float32),
        interpret=interpret,
    )(_stack_mov(gyl, mc), _stack_mov(gxl, mc), windows)
    # Residuals carry the already-built windows + window-local coords so the
    # backward skips _build's window stacking / tiling transposes entirely.
    out = (
        out.reshape(ny, nx, mch, c, mc, b, b)
        .transpose(2, 4, 0, 5, 1, 6, 3)
        .reshape(m, ny * b, nx * b, c)
    )
    return out, (planes, windows, gyl, gxl)


def _warp_tiled_bwd(tile, win, interpret, res, d_out):
    planes, windows, gyl, gxl = res
    c, h, w = planes.shape
    m = gyl.shape[1]
    b = tile
    ny, nx = d_out.shape[1] // b, d_out.shape[2] // b
    sys_ = _window_starts(h, ny, b, win)
    sxs_ = _window_starts(w, nx, b, win)
    n = b * b
    k = ny * nx
    mc = _mov_chunks(m, n, win, n_hats=4)
    mcn = mc * n
    mch = m // mc
    d_tiled = (
        d_out.reshape(mch, mc, ny, b, nx, b, c)
        .transpose(2, 4, 0, 6, 1, 3, 5)
        .reshape(k, mch, c, mcn)
        .astype(jnp.float32)
    )
    # Movement-chunk-indexed first-visit flag for the in-kernel d_win
    # accumulation (see _bwd_kernel; (MCH, 1, mcn) so the block's trailing
    # dims match the array's — the Mosaic block-shape constraint).  Within a
    # chunk the mc movements accumulate into d_win through the ay^T matmul
    # itself (rows of all mc movements share the contraction).
    first = jnp.zeros((mch, 1, mcn), jnp.float32).at[0].set(1.0)
    d_win, d_gyl, d_gxl = pl.pallas_call(
        functools.partial(_bwd_kernel, wy=win, wx=win, c=c),
        grid=(k, mch),
        in_specs=[
            pl.BlockSpec((1, 1, mcn), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c, mcn), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, c, win, win), jnp.float32),
            jax.ShapeDtypeStruct((k, mch, 1, mcn), jnp.bfloat16),
            jax.ShapeDtypeStruct((k, mch, 1, mcn), jnp.bfloat16),
        ],
        interpret=interpret,
    )(first, _stack_mov(gyl, mc), _stack_mov(gxl, mc), windows, d_tiled)
    # Barrier: without it XLA fuses the untiling transposes into the
    # custom-call's output scope and promotes a full gradient buffer
    # into scoped VMEM inside the scanned fit step (OOM at the 16 MB limit).
    d_win, d_gyl, d_gxl = jax.lax.optimization_barrier(
        (d_win, d_gyl, d_gxl)
    )

    # Un-slice the per-window gradients (overlaps add; static pads).
    d_planes = jnp.zeros_like(planes)
    ki = 0
    for sy in sys_:
        for sx in sxs_:
            d_planes = d_planes.at[:, sy : sy + win, sx : sx + win].add(
                d_win[ki]
            )
            ki += 1

    def untile1(x):  # (K, MCH, 1, mcn) -> (M, Ho, Wo)
        t = x.astype(jnp.float32).reshape(ny, nx, mch, mc, b, b)
        return t.transpose(2, 3, 0, 4, 1, 5).reshape(m, ny * b, nx * b)

    return d_planes, untile1(d_gyl), untile1(d_gxl)


_warp_tiled.defvjp(_warp_tiled_fwd, _warp_tiled_bwd)


# --- XLA-hats joint warp (round 5) ---------------------------------------
#
# Honest (fully-carried, two-length) round-5 measurements overturned every
# prior attribution: the fused kernels' ~18 us per (movement, window) unit
# is per-ROW VPU work on the in-kernel hat construction — win-independent
# below 128 because a (rows, win<=128) op occupies ONE lane tile, and
# tile/chunk-count-independent because total rows B*M*H*W is fixed (this
# explains every "flat" probe in rounds 2-5).  The XH variant therefore
# builds the hat rows in plain XLA — ONE fused bandwidth-limited pass per
# direction (~630 MB bf16 at fit shapes) — and streams them into
# apply-style kernels, turning the per-row VPU floor into an HBM-rate
# read.  Numerics are bit-identical to the fused kernels: same f32 hat
# expression, same bf16 cast, same matmul order/dtypes.


def _hat_rows(pos: jnp.ndarray, win: int) -> jnp.ndarray:
    """pos (..., n) -> (..., n, win) bf16 hat rows, one fused XLA pass.
    f32 iota == the kernels' int32-iota-then-cast on integer values."""
    idx = jax.lax.broadcasted_iota(
        jnp.float32, (*pos.shape, win), pos.ndim
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[..., None])).astype(
        jnp.bfloat16
    )


def _hat_d_rows(pos: jnp.ndarray, win: int) -> jnp.ndarray:
    """d(hat)/d(pos) rows (see _hat_d), bf16, one fused XLA pass."""
    idx = jax.lax.broadcasted_iota(
        jnp.float32, (*pos.shape, win), pos.ndim
    )
    e = idx - pos[..., None]
    lo = jnp.where((e > -1.0) & (e <= 0.0), -1.0, 0.0)
    hi = jnp.where((e > 0.0) & (e <= 1.0), 1.0, 0.0)
    return (lo + hi).astype(jnp.bfloat16)


def _xh_bwd_kernel(
    first_ref, ay_ref, ax_ref, ayd_ref, axd_ref, win_ref, dout_ref,
    dwin_ref, dgy_ref, dgx_ref, *, c
):
    """_bwd_kernel with the four hat constructions replaced by streamed
    operands; identical matmul/accumulation structure (d_win resident
    across the movement axis, first-visit select)."""
    ay = ay_ref[0, 0]  # (n, win) bf16
    ax = ax_ref[0, 0]
    ayd = ayd_ref[0, 0]
    axd = axd_ref[0, 0]
    n = ay.shape[0]
    dgy = jnp.zeros((n,), jnp.float32)
    dgx = jnp.zeros((n,), jnp.float32)
    first = first_ref[0, 0, 0] > 0.5
    for ci in range(c):
        w = win_ref[0, ci]  # (win, win) bf16
        do = dout_ref[0, 0, ci, :]  # (n,) f32
        rows = jax.lax.dot_general(
            ay, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        rows_d = jax.lax.dot_general(
            ayd, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        dgy += jnp.sum(rows_d * ax, axis=1, dtype=jnp.float32) * do
        dgx += jnp.sum(rows * axd, axis=1, dtype=jnp.float32) * do
        t = (ax * do[:, None]).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            ay, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        prev = jnp.where(first, jnp.zeros_like(contrib), dwin_ref[0, ci])
        dwin_ref[0, ci] = prev + contrib
    dgy_ref[0, 0, 0, :] = dgy.astype(jnp.bfloat16)
    dgx_ref[0, 0, 0, :] = dgx.astype(jnp.bfloat16)


def _stack_hats(a: jnp.ndarray, mc: int) -> jnp.ndarray:
    """(K, M, n, win) -> (K, M/mc, mc*n, win) contiguity-preserving."""
    k, m, n, win = a.shape
    return a.reshape(k, m // mc, mc * n, win)


def _xh_chunk(m: int, n: int, win: int, is_bwd: bool) -> int:
    """Streamed-hat kernels hold double-buffered hat blocks + matmul
    intermediates; caps probed on this backend."""
    cap = 800_000 if is_bwd else 1_600_000
    for mc in range(m, 0, -1):
        if m % mc:
            continue
        if mc * n * win <= cap:
            return mc
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp_tiled_xh(planes, gy_px, gx_px, tile: int, win: int, interpret: bool):
    """XLA-hats variant of _warp_tiled: identical semantics and numerics."""
    out, _ = _warp_tiled_xh_fwd(planes, gy_px, gx_px, tile, win, interpret)
    return out


def _warp_tiled_xh_fwd(planes, gy_px, gx_px, tile, win, interpret):
    windows, gyl, gxl, meta = _build(planes, gy_px, gx_px, tile, win)
    c, m, ny, nx, b, win, _, _ = meta
    n = b * b
    k = ny * nx
    ay = _hat_rows(gyl[:, :, 0, :], win)  # (K, M, n, win) bf16
    ax = _hat_rows(gxl[:, :, 0, :], win)
    mc = _xh_chunk(m, n, win, is_bwd=False)
    mcn = mc * n
    mch = m // mc
    out = pl.pallas_call(
        functools.partial(_apply_fwd_kernel, c=c),
        grid=(k, mch),
        in_specs=[
            pl.BlockSpec((1, 1, mcn, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, mcn, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, mcn), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, mch, c, mcn), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _cparams("parallel", "parallel"),
    )(_stack_hats(ay, mc), _stack_hats(ax, mc), windows.astype(jnp.bfloat16))
    out = (
        out.reshape(ny, nx, mch, c, mc, b, b)
        .transpose(2, 4, 0, 5, 1, 6, 3)
        .reshape(m, ny * b, nx * b, c)
    )
    # Residuals reuse the forward's hats (no rebuild in bwd) + local coords
    # (for the derivative rows) + windows.
    return out, (planes, windows, gyl, gxl, ay, ax)


def _warp_tiled_xh_bwd(tile, win, interpret, res, d_out):
    planes, windows, gyl, gxl, ay, ax = res
    c, h, w = planes.shape
    m = gyl.shape[1]
    b = tile
    ny, nx = d_out.shape[1] // b, d_out.shape[2] // b
    sys_ = _window_starts(h, ny, b, win)
    sxs_ = _window_starts(w, nx, b, win)
    n = b * b
    k = ny * nx
    ayd = _hat_d_rows(gyl[:, :, 0, :], win)
    axd = _hat_d_rows(gxl[:, :, 0, :], win)
    mc = _xh_chunk(m, n, win, is_bwd=True)
    mcn = mc * n
    mch = m // mc
    d_tiled = (
        d_out.reshape(mch, mc, ny, b, nx, b, c)
        .transpose(2, 4, 0, 6, 1, 3, 5)
        .reshape(k, mch, c, mcn)
        .astype(jnp.float32)
    )
    first = jnp.zeros((mch, 1, mcn), jnp.float32).at[0].set(1.0)
    hat_spec = pl.BlockSpec((1, 1, mcn, win), lambda i, j: (i, j, 0, 0))
    d_win, d_gyl, d_gxl = pl.pallas_call(
        functools.partial(_xh_bwd_kernel, c=c),
        grid=(k, mch),
        in_specs=[
            pl.BlockSpec((1, 1, mcn), lambda i, j: (j, 0, 0)),
            hat_spec, hat_spec, hat_spec, hat_spec,
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c, mcn), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, mcn), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, c, win, win), jnp.float32),
            jax.ShapeDtypeStruct((k, mch, 1, mcn), jnp.bfloat16),
            jax.ShapeDtypeStruct((k, mch, 1, mcn), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _cparams("parallel", "arbitrary"),
    )(
        first, _stack_hats(ay, mc), _stack_hats(ax, mc),
        _stack_hats(ayd, mc), _stack_hats(axd, mc),
        windows.astype(jnp.bfloat16), d_tiled,
    )
    d_win, d_gyl, d_gxl = jax.lax.optimization_barrier(
        (d_win, d_gyl, d_gxl)
    )
    d_planes = jnp.zeros_like(planes)
    ki = 0
    for sy in sys_:
        for sx in sxs_:
            d_planes = d_planes.at[:, sy : sy + win, sx : sx + win].add(
                d_win[ki]
            )
            ki += 1

    def untile1(x):  # (K, MCH, 1, mcn) -> (M, Ho, Wo)
        t = x.astype(jnp.float32).reshape(ny, nx, mch, mc, b, b)
        return t.transpose(2, 3, 0, 4, 1, 5).reshape(m, ny * b, nx * b)

    return d_planes, untile1(d_gyl), untile1(d_gxl)


_warp_tiled_xh.defvjp(_warp_tiled_xh_fwd, _warp_tiled_xh_bwd)


def _resolve_win(tile_px: int, win_px: int | None, h: int, w: int) -> int:
    """Source-window edge for a tile.  Default (None/0) keeps the historic
    2*tile geometry; an explicit win_px < 2*tile shrinks the hat-row and
    window-matmul work proportionally when the displacement cap is small
    (exactness needs motion_disp_px <= (win - tile)/2 - 2; round-4 probe:
    tile 64 / win 96 / cap 14 holds bench quality).  Must be a multiple of
    8 (f32 sublane) and >= tile + 8; clamped to the image edge."""
    if not win_px:
        return 2 * tile_px
    if win_px % 8 or win_px < tile_px + 8:
        raise ValueError(
            f"win_px={win_px} must be a multiple of 8 and >= tile_px + 8"
        )
    if win_px > min(h, w):
        raise ValueError(f"win_px={win_px} larger than image ({h},{w})")
    return win_px


def bilinear_sample_tiled_pallas(
    image: jnp.ndarray,
    grids: jnp.ndarray,
    align_corners: bool = False,
    tile_px: int = 64,
    win_px: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for warp_mm.bilinear_sample_mm (zeros padding) with the tiled
    Pallas kernels.  Exact iff every grid displacement from the identity is
    <= (win - tile)/2 - 2 pixels (config-gated via motion_disp_px; win
    defaults to 2*tile)."""
    h, w = image.shape
    m, ho, wo, _ = grids.shape
    if ho % tile_px or wo % tile_px:
        raise ValueError(f"({ho},{wo}) not divisible by tile_px={tile_px}")
    return bilinear_sample_tiled_pallas_planes(
        image,
        grids[..., 1],
        grids[..., 0],
        align_corners=align_corners,
        tile_px=tile_px,
        win_px=win_px,
        interpret=interpret,
    )


def bilinear_sample_tiled_pallas_planes(
    image: jnp.ndarray,
    gy_n: jnp.ndarray,
    gx_n: jnp.ndarray,
    align_corners: bool = False,
    tile_px: int = 64,
    win_px: int | None = None,
    interpret: bool | None = None,
    xla_hats: bool = False,
) -> jnp.ndarray:
    """Planes entry: normalized sampling coordinates as separate (M, Ho, Wo)
    y/x planes — the channel-first model path feeds these directly, so no
    (..., 2) trailing-dim array (lane-padded 64x on TPU) is ever built.

    ``xla_hats=True`` selects the round-5 XH variant (hat rows built in one
    fused XLA pass, streamed into apply-style kernels — bit-identical
    numerics, HBM-rate instead of the per-row VPU floor)."""
    h, w = image.shape
    m, ho, wo = gy_n.shape
    if ho % tile_px or wo % tile_px:
        raise ValueError(f"({ho},{wo}) not divisible by tile_px={tile_px}")
    win = _resolve_win(tile_px, win_px, h, w)
    if h < win or w < win:
        raise ValueError(f"image smaller than window {win}")
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

    gx = unnormalize(gx_n, w)
    gy = unnormalize(gy_n, h)
    fn = _warp_tiled_xh if xla_hats else _warp_tiled
    out = fn(planes, gy, gx, tile_px, win, interpret)  # (M,Ho,Wo,C)
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]


# --- Apply-only kernels for FROZEN grids (cfg.motion_freeze_iters) --------
#
# In the motion-frozen fit phase the sampling grids are segment-constant, so
# the hat rows — the ~18 us/(movement, window) VPU floor of the fused
# kernels above — can be built ONCE per segment in plain XLA
# (warp_tiled_frozen_weights) and streamed into apply-only kernels as
# operands.  The forward keeps the fused kernel's matmul structure minus
# both _hat calls; the backward needs only the window gradient (weights are
# constants: no _hat_d, no dgy/dgx, no coordinate-gradient matmuls).
# Results are bit-identical to the fused kernels for the same grids (the
# hats are built with the same f32 expression and bf16 cast).
# Cost shifts from VPU elementwise to HBM weight reads: ay+ax are
# ~2 MB/(movement, window) bf16 — ~2.5 us at HBM rate vs ~18 us rebuilt.


def _apply_fwd_kernel(ay_ref, ax_ref, win_ref, out_ref, *, c):
    ay = ay_ref[0, 0]  # (n, win) bf16
    ax = ax_ref[0, 0]
    for ci in range(c):
        rows = jax.lax.dot_general(
            ay,
            win_ref[0, ci],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (n, win)
        out_ref[0, 0, ci, :] = jnp.sum(rows * ax, axis=1, dtype=jnp.float32)


def _apply_bwd_kernel(first_ref, ay_ref, ax_ref, dout_ref, dwin_ref, *, c):
    # Same VMEM window-gradient accumulation as _bwd_kernel (movement axis
    # innermost, dwin index_map ignores it, first-visit select), with the
    # weight-construction and coordinate-gradient work deleted.
    ay = ay_ref[0, 0]
    ax = ax_ref[0, 0]
    first = first_ref[0, 0, 0] > 0.5
    for ci in range(c):
        do = dout_ref[0, 0, ci, :]  # (n,) f32
        t = (ax * do[:, None].astype(jnp.float32)).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            ay, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (win, win)
        prev = jnp.where(first, jnp.zeros_like(contrib), dwin_ref[0, ci])
        dwin_ref[0, ci] = prev + contrib


def warp_tiled_frozen_weights(
    gy_n: jnp.ndarray,
    gx_n: jnp.ndarray,
    h: int,
    w: int,
    tile_px: int = 64,
    win_px: int | None = None,
    align_corners: bool = False,
):
    """Precompute hat-weight rows for FIXED normalized sampling planes.

    gy_n/gx_n: (M, Ho, Wo) normalized coords (the model's channel-first
    grids).  Returns {"ay", "ax"}: (K, M, n, win) bf16 hat rows in the
    fused kernels' window geometry (win defaults to 2*tile, same
    _window_starts), so warp_tiled_frozen_apply reproduces
    bilinear_sample_tiled_pallas_planes exactly.  Built in plain XLA — a
    once-per-segment cost."""
    m, ho, wo = gy_n.shape
    b = tile_px
    win = _resolve_win(b, win_px, h, w)
    ny, nx = ho // b, wo // b

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    sys_ = _window_starts(h, ny, b, win)
    sxs_ = _window_starts(w, nx, b, win)
    sy_t = jnp.asarray([float(sy) for sy in sys_ for _ in sxs_], jnp.float32)
    sx_t = jnp.asarray([float(sx) for _ in sys_ for sx in sxs_], jnp.float32)
    gyl = (
        _tile_coords(unnormalize(gy_n, h), ny, nx, b)
        - sy_t[:, None, None, None]
    )[:, :, 0]  # (K, M, n)
    gxl = (
        _tile_coords(unnormalize(gx_n, w), ny, nx, b)
        - sx_t[:, None, None, None]
    )[:, :, 0]

    def hat(pos):  # (K, M, n) -> (K, M, n, win)
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (*pos.shape, win), pos.ndim
        ).astype(jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[..., None])).astype(
            jnp.bfloat16
        )

    return {"ay": hat(gyl), "ax": hat(gxl), "tile_px": b, "win": win,
            "h": h, "w": w, "ho": ho, "wo": wo}


@jax.custom_vjp
def _apply_windows(windows, ay, ax):
    """(K, C, win, win) windows x (K, M, n, win) weights -> (K, M, C, n).

    custom_vjp only at the kernel pair: the window stacking / untiling
    around it are plain slices/transposes whose autodiff (sum-of-pads /
    transpose) is already gather/scatter-free."""
    out, _ = _apply_windows_fwd(windows, ay, ax)
    return out


def _apply_windows_fwd(windows, ay, ax):
    k, m, n, win = ay.shape
    c = windows.shape[1]
    out = pl.pallas_call(
        functools.partial(_apply_fwd_kernel, c=c),
        grid=(k, m),
        in_specs=[
            pl.BlockSpec((1, 1, n, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, n, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, n), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, m, c, n), jnp.float32),
        interpret=_interpret_default(),
    )(ay, ax, windows.astype(jnp.bfloat16))
    return out, (ay, ax, windows.shape)


def _apply_windows_bwd(res, d_out):
    ay, ax, win_shape = res
    k, m, n, win = ay.shape
    c = win_shape[1]
    first = jnp.zeros((m, 1, n), jnp.float32).at[0].set(1.0)
    d_win = pl.pallas_call(
        functools.partial(_apply_bwd_kernel, c=c),
        grid=(k, m),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, n, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, n, win), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c, n), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, win, win), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, c, win, win), jnp.float32),
        interpret=_interpret_default(),
    )(first, ay, ax, d_out.astype(jnp.float32))
    # Same VMEM-promotion guard as _warp_tiled_bwd.
    d_win = jax.lax.optimization_barrier(d_win)
    # Weight cotangents are structurally zero (frozen grids); broadcasted
    # zeros cost nothing materialized.  d_win stays f32 (the windows arg is
    # f32 at this boundary — the bf16 cast lives inside the fwd — so the
    # overlap summation in the caller's slice autodiff runs in f32, exactly
    # like the fused kernel's manual un-slicing).
    return (
        d_win,
        jnp.zeros_like(ay),
        jnp.zeros_like(ax),
    )


_apply_windows.defvjp(_apply_windows_fwd, _apply_windows_bwd)


def _stack_windows(planes, sys_, sxs_, win):
    # f32: the bf16 cast happens inside _apply_windows_fwd so the windows
    # cotangent (and its overlap summation) stays f32.
    return jnp.stack(
        [
            planes[:, sy : sy + win, sx : sx + win]
            for sy in sys_
            for sx in sxs_
        ]
    )  # (K, C, win, win)


def warp_tiled_frozen_apply(image: jnp.ndarray, wts) -> jnp.ndarray:
    """Warp one (H, W) complex/real image with warp_tiled_frozen_weights.

    Bit-identical to bilinear_sample_tiled_pallas_planes for the planes the
    weights were built from (same window geometry, hat expression, matmul
    order/dtypes); differentiable w.r.t. the image only."""
    b = wts["tile_px"]
    h, w, ho, wo = wts["h"], wts["w"], wts["ho"], wts["wo"]
    win = wts.get("win", 2 * b)
    ny, nx = ho // b, wo // b
    m = wts["ay"].shape[1]
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=0)
    else:
        planes = image[None]
    c = planes.shape[0]
    sys_ = _window_starts(h, ny, b, win)
    sxs_ = _window_starts(w, nx, b, win)
    windows = _stack_windows(planes, sys_, sxs_, win)
    out = _untile(
        _apply_windows(windows, wts["ay"], wts["ax"]), m, ny, nx, b, c
    )
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]
