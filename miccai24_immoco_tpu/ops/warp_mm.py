"""Matmul-formulated bilinear warping — the MXU path for grid_sample.

The gather-based warp (ops/warp.py) lowers to an XLA gather in the forward
pass and a scatter-add in the backward pass; TPU executes large random
scatters poorly (they serialize), and the fit-step HLO shows exactly one
such scatter — the gradient of the warped images w.r.t. the shared image.

Bilinear sampling is a linear map of the image, so it can be written with
one-hot interpolation matrices and evaluated on the MXU:

    out[p] = sum_y sum_x Ay[p, y] * Ax[p, x] * img[y, x]
           = rowsum( (Ay @ img) * Ax )

with Ay (N, H) holding (1-ty, ty) at rows (y0, y0+1) and Ax (N, W) the same
along x.  Every operation — forward AND backward (autodiff of matmuls is
matmuls) — is dense linear algebra; out-of-range corners produce all-zero
one-hot rows, which reproduces "zeros" padding exactly.  Gradients w.r.t.
the sampling grid flow through the (1-t, t) weights (the floor() is
piecewise-constant, as in the gather formulation).

Cost: 2 * N * H matmul FLOPs per image column-block per movement — ~10.5
GFLOP per (320^2, 320^2) movement in bf16, which the MXU eats in ~0.1 ms;
movements are processed under lax.map to bound the one-hot working set.

Semantics match ops/warp.grid_sample(mode="bilinear", padding_mode="zeros",
align_corners=False) — golden-tested in tests/test_warp_mm.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot_cubic(pos: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """pos: (N,) fractional pixel coords -> (N, size) cubic-convolution
    interpolation rows (a = -0.75, torch bicubic) with 4 taps at
    floor(pos) + (-1, 0, 1, 2); taps outside [0, size) contribute zero,
    matching grid_sample's zeros padding."""
    from miccai24_immoco_tpu.ops.warp import _cubic_weights

    p0 = jnp.floor(pos)
    t = pos - p0
    weights = _cubic_weights(t)  # 4 x (N,)
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
    p0i = p0.astype(jnp.int32)[:, None]
    out = jnp.zeros((pos.shape[0], size), dtype)
    for tap in range(4):
        onehot = (idx == p0i + (tap - 1)).astype(dtype)
        out = out + onehot * weights[tap].astype(dtype)[:, None]
    return out


def bicubic_sample_mm(
    image: jnp.ndarray,
    grids: jnp.ndarray,
    align_corners: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Bicubic counterpart of bilinear_sample_mm for (M, H, W) per-movement
    images (each movement warps its OWN image — the Autofocusing layout,
    autofocusing.py:75-85), grid_sample(bicubic, zeros, align_corners=False)
    semantics via one-hot cubic matmuls."""
    m, h, w = image.shape
    _, ho, wo, _ = grids.shape
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=-1)
    else:
        planes = image[..., None]
    planes_c = planes.astype(compute_dtype)  # (M, H, W, C)

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    @jax.checkpoint
    def warp_one(args):
        grid, pl = args
        gx = unnormalize(grid[..., 0].reshape(-1), w)
        gy = unnormalize(grid[..., 1].reshape(-1), h)
        ay = _one_hot_cubic(gy, h, compute_dtype)
        ax = _one_hot_cubic(gx, w, compute_dtype)
        rows = jax.lax.dot_general(
            ay, pl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum("nwc,nw->nc", rows.astype(compute_dtype), ax,
                         preferred_element_type=jnp.float32)
        return out.reshape(ho, wo, -1)

    out = jax.lax.map(warp_one, (grids, planes_c))
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]


def _one_hot_lerp(pos: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """pos: (N,) fractional pixel coordinates -> (N, size) interpolation
    rows with (1-t, t) at (floor(pos), floor(pos)+1); zero outside."""
    p0 = jnp.floor(pos)
    t = (pos - p0).astype(dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
    p0i = p0.astype(jnp.int32)[:, None]
    lo = (idx == p0i).astype(dtype)
    hi = (idx == p0i + 1).astype(dtype)
    return lo * (1.0 - t)[:, None] + hi * t[:, None]


def _one_hot_pair(pos: jnp.ndarray, size: int, dtype):
    """pos: (N,) -> (lo, hi, t): one-hot rows at floor(pos)/floor(pos)+1 and
    the fractional weight, shared by the lerp row and its derivative row."""
    p0 = jnp.floor(pos)
    t = (pos - p0).astype(dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
    p0i = p0.astype(jnp.int32)[:, None]
    lo = (idx == p0i).astype(dtype)
    hi = (idx == p0i + 1).astype(dtype)
    return lo, hi, t


def _mm_nh(a, b, out_dtype):
    """(N, K) @ (K, M) with fp32 MXU accumulation, emitted as out_dtype."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def _bilinear_point_sample_cvjp(compute_dtype):
    """custom-VJP core: (planes (H, W, C), gx (N,), gy (N,)) -> (N, C).

    Forward: the one-hot matmul formulation (rows = Ay @ planes, then the
    per-point x-contraction).  Backward: hand-written matmuls instead of
    XLA's autodiff of the einsum — the autodiff backward measured ~67 ms of
    a 111 ms fit iteration (scripts/ablate_timing.py) while the whole
    forward is 3.4 ms.  Uses the identity that the gradient w.r.t. a
    sampling coordinate is the sampled finite difference:

        d/dgy out[n]  = sum_w ax[n, w] * ((Ay_hi - Ay_lo) @ planes)[n, w]
        d/dgx out[n]  = sum_w (Ax_hi - Ax_lo)[n, w] * (Ay @ planes)[n, w]
        d_planes      = Ay^T @ (ax ⊙ d_out)       (one (H,N)@(N,WC) matmul)

    so the whole backward is three dense MXU matmuls plus elementwise work,
    with the one-hots recomputed (nothing big saved from the forward).
    Semantics identical to the autodiff path (floor() is treated as
    piecewise-constant; out-of-range taps contribute zero value AND zero
    coordinate gradient) — gradient-tested against the gather reference.
    """

    @jax.custom_vjp
    def sample(planes, gx, gy):
        out, _ = _fwd(planes, gx, gy)
        return out

    def _fwd(planes, gx, gy):
        h, w, c = planes.shape
        lo_y, hi_y, ty = _one_hot_pair(gy, h, compute_dtype)
        lo_x, hi_x, tx = _one_hot_pair(gx, w, compute_dtype)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        ax = lo_x * (1.0 - tx)[:, None] + hi_x * tx[:, None]
        rows = _mm_nh(ay, planes.reshape(h, w * c), compute_dtype).reshape(
            -1, w, c
        )
        out = jnp.einsum(
            "nwc,nw->nc", rows, ax, preferred_element_type=jnp.float32
        )
        return out, (planes, gx, gy)

    def _bwd(res, d_out):
        planes, gx, gy = res
        h, w, c = planes.shape
        n = gx.shape[0]
        lo_y, hi_y, ty = _one_hot_pair(gy, h, compute_dtype)
        lo_x, hi_x, tx = _one_hot_pair(gx, w, compute_dtype)
        ay = lo_y * (1.0 - ty)[:, None] + hi_y * ty[:, None]
        ax = lo_x * (1.0 - tx)[:, None] + hi_x * tx[:, None]
        ayd = hi_y - lo_y
        axd = hi_x - lo_x
        d_out_c = d_out.astype(compute_dtype)

        planes_flat = planes.reshape(h, w * c)
        rows = _mm_nh(ay, planes_flat, compute_dtype).reshape(n, w, c)
        rows_dy = _mm_nh(ayd, planes_flat, compute_dtype).reshape(n, w, c)

        # d_gy[n] = sum_{w,c} ax[n,w] * rows_dy[n,w,c] * d_out[n,c]
        d_gy = jnp.einsum(
            "nwc,nw,nc->n", rows_dy, ax, d_out_c,
            preferred_element_type=jnp.float32,
        )
        d_gx = jnp.einsum(
            "nwc,nw,nc->n", rows, axd, d_out_c,
            preferred_element_type=jnp.float32,
        )
        # d_planes = Ay^T @ (ax[n,w] * d_out[n,c])
        tmp = (ax[:, :, None] * d_out_c[:, None, :]).reshape(n, w * c)
        d_planes = jax.lax.dot_general(
            ay, tmp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h, w, c).astype(planes.dtype)
        return d_planes, d_gx.astype(gx.dtype), d_gy.astype(gy.dtype)

    sample.defvjp(lambda p, x, y: _fwd(p, x, y), _bwd)
    return sample


def _one_hot_lerp_batched(pos: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """pos: (..., N) fractional pixel coordinates -> (..., N, size)
    interpolation rows with (1-t, t) at (floor(pos), floor(pos)+1)."""
    p0 = jnp.floor(pos)
    t = (pos - p0).astype(dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (*pos.shape, size), pos.ndim)
    p0i = p0.astype(jnp.int32)[..., None]
    lo = (idx == p0i).astype(dtype)
    hi = (idx == p0i + 1).astype(dtype)
    return lo * (1.0 - t)[..., None] + hi * t[..., None]


def bilinear_sample_mm(
    image: jnp.ndarray,
    grids: jnp.ndarray,
    align_corners: bool = False,
    compute_dtype=jnp.bfloat16,
    band_px: int = 0,
    tile_px: int = 0,
    padding_mode: str = "zeros",
    use_custom_vjp: bool = False,
    unroll: bool = False,
    band_dynamic: bool = False,
) -> jnp.ndarray:
    """Warp one (H, W) complex/real image by (M, Ho, Wo, 2) sampling grids.

    Equivalent to vmapped grid_sample(..., "bilinear", "zeros",
    align_corners) of the shared image; all-matmul implementation.

    band_px > 0 enables the *banded* variant: output rows are processed in
    blocks of ``band_px`` and the y one-hot spans only the 3-block image-row
    window around each block, cutting the dominant matmul's K dimension from
    H to 3*band_px (3.3x fewer FLOPs at 320^2 with band_px=32).  Exact as
    long as every point's vertical displacement satisfies
    |gy - row| <= band_px - 1 (callers bound the displacement field; see
    InstanceFitConfig.motion_disp_px).  Requires Ho % band_px == 0.

    tile_px > 0 enables the *2-D tiled* variant (supersedes band_px): the
    output is processed in (tile, tile) blocks and BOTH one-hots span only
    the 3-tile window around each block — unlike the 1-D band, this also
    shrinks the (N, W, C) "rows" intermediate, the real bandwidth cost, and
    cuts FLOPs ~(H/3b)(W/3b)x (11x at 320^2, b=32).  Window slices use
    STATIC per-tile starts (Python ints), so the image gradient is a sum of
    pads — no gather/scatter in either direction.  Exact under the same
    displacement bound (both axes), |disp| <= tile_px - 1; requires
    Ho % tile_px == Wo % tile_px == 0 and H, W >= 3*tile_px.
    """
    h, w = image.shape
    m, ho, wo, _ = grids.shape
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=-1)  # (H, W, 2)
    else:
        planes = image[..., None]
    planes_c = planes.astype(compute_dtype)

    def unnormalize(coord, size):
        if align_corners:
            out = (coord + 1.0) * 0.5 * (size - 1)
        else:
            out = ((coord + 1.0) * size - 1.0) * 0.5
        if padding_mode == "border":
            # torch bilinear border padding clips the source coordinate
            # (grid_sampler_compute_source_index), which keeps the one-hot
            # rows in range — exact semantics match.
            out = jnp.clip(out, 0.0, size - 1)
        return out

    def _sample(ay, ax, planes_block):
        # rows[p, x, c] = sum_y ay[p, y] * planes_block[y, x, c].
        # The (N, W, C) rows intermediate is the step's dominant HBM
        # traffic; emit it directly in compute_dtype (the einsum consumes
        # it in compute_dtype anyway — fp32-out + cast would double the
        # bytes for identical downstream math; MXU accumulation is fp32
        # internally either way).
        rows = jax.lax.dot_general(
            ay,
            planes_block,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=compute_dtype,
        )  # (N, W, C) compute_dtype
        return jnp.einsum(
            "nwc,nw->nc", rows, ax,
            preferred_element_type=jnp.float32,
        )

    @jax.checkpoint
    def warp_one(grid):  # (Ho, Wo, 2) -> (Ho, Wo, planes)
        # Rematerialized: the one-hot matrices (N x H bf16 each) would
        # otherwise be saved per movement for the backward pass (~25 GB for
        # a batch of four 24-movement fits); recomputing them costs two
        # cheap elementwise passes.
        gx = unnormalize(grid[..., 0].reshape(-1), w)
        gy = unnormalize(grid[..., 1].reshape(-1), h)
        ay = _one_hot_lerp(gy, h, compute_dtype)  # (N, H)
        ax = _one_hot_lerp(gx, w, compute_dtype)  # (N, W)
        return _sample(ay, ax, planes_c).reshape(ho, wo, -1)

    @jax.checkpoint
    def warp_one_banded(grid):  # (Ho, Wo, 2) with block-local y one-hots
        b = band_px
        n_blocks = ho // b
        win = 3 * b

        def block(i):
            g = jax.lax.dynamic_slice(
                grid, (i * b, 0, 0), (b, wo, 2)
            )
            gx = unnormalize(g[..., 0].reshape(-1), w)
            gy = unnormalize(g[..., 1].reshape(-1), h)
            # Image-row window [start, start + 3b) covering rows
            # [i*b - b, (i+1)*b + b), clipped to the image.
            start = jnp.clip(i * b - b, 0, h - win)
            ay = _one_hot_lerp(gy - start, win, compute_dtype)  # (n, 3b)
            ax = _one_hot_lerp(gx, w, compute_dtype)
            pb = jax.lax.dynamic_slice(
                planes_c, (start, 0, 0), (win, w, planes_c.shape[-1])
            )
            return _sample(ay, ax, pb).reshape(b, wo, -1)

        # vmap (not lax.map): 10 blocks of ~1 GFLOP each must overlap to
        # keep the MXU busy; sequential mapping measured slower than the
        # dense one-hot despite 3.3x fewer FLOPs.
        return jax.vmap(block)(jnp.arange(n_blocks)).reshape(ho, wo, -1)

    @jax.checkpoint
    def warp_one_band_static(grid):  # (Ho, Wo, 2), static row-band windows
        """1-D row banding with STATIC (Python-int) window starts: row
        blocks are contiguous (no transposes), windows are static slices
        (backward = sum of pads, no scatter), and all blocks evaluate as a
        single batched matmul with K = 3*band instead of H."""
        b = band_px
        nb = ho // b
        win = 3 * b
        n = b * wo
        c = planes_c.shape[-1]
        sys_ = [min(max(i * b - b, 0), h - win) for i in range(nb)]
        windows = jnp.stack(
            [planes_c[sy : sy + win].reshape(win, w * c) for sy in sys_]
        )  # (nb, win, W*C)
        gt = grid.reshape(nb, n, 2)
        gx = unnormalize(gt[..., 0], w)  # (nb, n)
        gy = unnormalize(gt[..., 1], h) - jnp.asarray(
            sys_, jnp.float32
        )[:, None]
        ay = _one_hot_lerp_batched(gy, win, compute_dtype)  # (nb, n, win)
        ax = _one_hot_lerp_batched(gx, w, compute_dtype)  # (nb, n, W)
        rows = jax.lax.dot_general(
            ay,
            windows,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=compute_dtype,
        ).reshape(nb, n, w, c)
        out = jnp.einsum(
            "bnwc,bnw->bnc", rows, ax, preferred_element_type=jnp.float32
        )
        return out.reshape(ho, wo, c)

    @jax.checkpoint
    def warp_one_tiled(grid):  # (Ho, Wo, 2) with 2-D block-local one-hots
        b = tile_px
        ny, nx = ho // b, wo // b
        win = 3 * b
        n = b * b
        c = planes_c.shape[-1]
        # Static (Python-int) window starts per tile, clipped to the image;
        # the stacked static slices make the backward a sum of pads.
        sys_ = [min(max(iy * b - b, 0), h - win) for iy in range(ny)]
        sxs_ = [min(max(ix * b - b, 0), w - win) for ix in range(nx)]
        windows = jnp.stack(
            [
                planes_c[sy : sy + win, sx : sx + win]
                for sy in sys_
                for sx in sxs_
            ]
        ).reshape(ny * nx, win, win * c)  # (T, win, win*C)
        # fp32 (NOT compute_dtype): tile starts up to H are not exactly
        # representable in bfloat16 and the one-hot floor() needs exact ints.
        sy_t = jnp.asarray(
            [float(sy) for sy in sys_ for _ in sxs_], jnp.float32
        )
        sx_t = jnp.asarray(
            [float(sx) for _ in sys_ for sx in sxs_], jnp.float32
        )
        gt = (
            grid.reshape(ny, b, nx, b, 2)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ny * nx, n, 2)
        )
        gx = unnormalize(gt[..., 0], w) - sx_t[:, None]
        gy = unnormalize(gt[..., 1], h) - sy_t[:, None]
        ay = _one_hot_lerp_batched(gy, win, compute_dtype)  # (T, n, win)
        ax = _one_hot_lerp_batched(gx, win, compute_dtype)  # (T, n, win)
        rows = jax.lax.dot_general(
            ay,
            windows,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(ny * nx, n, win, c)
        out = jnp.einsum(
            "tnwc,tnw->tnc",
            rows.astype(compute_dtype),
            ax,
            preferred_element_type=jnp.float32,
        )
        return (
            out.reshape(ny, nx, b, b, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ho, wo, c)
        )

    _point_sample = (
        _bilinear_point_sample_cvjp(compute_dtype) if use_custom_vjp else None
    )

    def warp_one_cvjp(grid):  # (Ho, Wo, 2) -> (Ho, Wo, planes)
        # Hand-written matmul backward (see _bilinear_point_sample_cvjp);
        # the unnormalize (and border clip) chain differentiates outside.
        gx = unnormalize(grid[..., 0].reshape(-1), w)
        gy = unnormalize(grid[..., 1].reshape(-1), h)
        return _point_sample(planes_c, gx, gy).reshape(ho, wo, -1)

    if tile_px > 0:
        if ho % tile_px or wo % tile_px:
            raise ValueError(
                f"({ho},{wo}) not divisible by tile_px={tile_px}"
            )
        if h < 3 * tile_px or w < 3 * tile_px:
            raise ValueError(f"image smaller than 3*tile_px={3*tile_px}")
        out = jax.lax.map(warp_one_tiled, grids)
    elif use_custom_vjp and band_px == 0:
        out = jax.lax.map(warp_one_cvjp, grids)
    elif unroll and band_px == 0:
        # Unrolled movement loop: lets XLA schedule/fuse across movements
        # instead of a sequential inner while with loop-carried stacking.
        out = jnp.stack([warp_one(grids[i]) for i in range(m)])
    elif band_px > 0:
        if ho % band_px:
            raise ValueError(f"Ho={ho} not divisible by band_px={band_px}")
        if h < 3 * band_px:
            raise ValueError(f"image smaller than 3*band_px={3*band_px}")
        out = jax.lax.map(
            warp_one_banded if band_dynamic else warp_one_band_static, grids
        )
    else:
        out = jax.lax.map(warp_one, grids)  # (M, Ho, Wo, C)
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]


# --- Frozen-grid warping: precomputed hat weights, apply-only per step ----
#
# In the trailing motion-frozen phase of the instance fit
# (InstanceFitConfig.motion_freeze_iters) the sampling grids are constant
# across iterations, so the hat-weight one-hots — whose construction is the
# measured VPU floor of every build+apply warp variant (~18 us per
# (movement, window) unit, PERFORMANCE.md) — can be built ONCE per segment
# and stored in HBM; each iteration then runs pure MXU matmuls forward AND
# backward (autodiff of matmuls against constant weights is transposed
# matmuls; no weight rebuild anywhere).  Storage (bf16, tile 32, 320^2):
# ~39 MB per movement — reading it back costs ~50 us/movement at HBM rate,
# ~30x cheaper than rebuilding.


def bilinear_weights_tiled(
    grids: jnp.ndarray,
    h: int,
    w: int,
    tile_px: int,
    align_corners: bool = False,
    compute_dtype=jnp.bfloat16,
):
    """Precompute 2-D tiled interpolation weights for FIXED sampling grids.

    grids: (M, Ho, Wo, 2) normalized sampling grids (grid_sample
    convention, zeros padding, ``align_corners``).  Returns a dict
    consumed by :func:`bilinear_apply_tiled`; exactness requires the same
    displacement bound as the tiled warp (|disp| <= tile_px - 1 on both
    axes) and Ho % tile_px == Wo % tile_px == 0, h, w >= 3 * tile_px.

    The weights carry no gradient: callers hold the grids fixed
    (stop_gradient upstream if needed).
    """
    m, ho, wo, _ = grids.shape
    b = tile_px
    if ho % b or wo % b:
        raise ValueError(f"({ho},{wo}) not divisible by tile_px={b}")
    if h < 3 * b or w < 3 * b:
        raise ValueError(f"image smaller than 3*tile_px={3*b}")
    ny, nx = ho // b, wo // b
    n = b * b
    sys_ = [min(max(iy * b - b, 0), h - 3 * b) for iy in range(ny)]
    sxs_ = [min(max(ix * b - b, 0), w - 3 * b) for ix in range(nx)]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    sy_t = jnp.asarray([float(sy) for sy in sys_ for _ in sxs_], jnp.float32)
    sx_t = jnp.asarray([float(sx) for _ in sys_ for sx in sxs_], jnp.float32)

    def weights_one(grid):  # (Ho, Wo, 2) -> (T, n, win) pair
        gt = (
            grid.reshape(ny, b, nx, b, 2)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ny * nx, n, 2)
        )
        gx = unnormalize(gt[..., 0], w) - sx_t[:, None]
        gy = unnormalize(gt[..., 1], h) - sy_t[:, None]
        ay = _one_hot_lerp_batched(gy, 3 * b, compute_dtype)
        ax = _one_hot_lerp_batched(gx, 3 * b, compute_dtype)
        return ay, ax

    ay, ax = jax.lax.map(weights_one, grids)  # (M, T, n, win) each
    return {
        "ay": ay,
        "ax": ax,
        "tile_px": b,
        "h": h,
        "w": w,
        "ho": ho,
        "wo": wo,
        "sys": tuple(sys_),
        "sxs": tuple(sxs_),
    }


def bilinear_apply_tiled(image: jnp.ndarray, wts) -> jnp.ndarray:
    """Warp one (h, w) complex/real image with precomputed tiled weights.

    Bit-identical to ``bilinear_sample_mm(image, grids, tile_px=...)`` for
    the grids the weights were built from (same matmul order and dtypes);
    golden-tested in tests/test_warp_mm.py.  Differentiable w.r.t. image
    only (weights are constants) — the backward is the transposed matmul
    pair, still gather/scatter-free.
    """
    b = wts["tile_px"]
    h, w, ho, wo = wts["h"], wts["w"], wts["ho"], wts["wo"]
    ny, nx = ho // b, wo // b
    n = b * b
    win = 3 * b
    compute_dtype = wts["ay"].dtype
    if jnp.iscomplexobj(image):
        planes = jnp.stack([image.real, image.imag], axis=-1)
    else:
        planes = image[..., None]
    planes_c = planes.astype(compute_dtype)
    c = planes_c.shape[-1]
    windows = jnp.stack(
        [
            planes_c[sy : sy + win, sx : sx + win]
            for sy in wts["sys"]
            for sx in wts["sxs"]
        ]
    ).reshape(ny * nx, win, win * c)  # (T, win, win*C)

    def apply_one(w_pair):  # ((T, n, win), (T, n, win)) -> (Ho, Wo, C)
        ay, ax = w_pair
        rows = jax.lax.dot_general(
            ay,
            windows,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(ny * nx, n, win, c)
        out = jnp.einsum(
            "tnwc,tnw->tnc",
            rows.astype(compute_dtype),
            ax,
            preferred_element_type=jnp.float32,
        )
        return (
            out.reshape(ny, nx, b, b, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ho, wo, c)
        )

    out = jax.lax.map(apply_one, (wts["ay"], wts["ax"]))  # (M, Ho, Wo, C)
    if jnp.iscomplexobj(image):
        return jax.lax.complex(out[..., 0], out[..., 1])
    return out[..., 0]
