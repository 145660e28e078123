"""Rigid 2-D k-space motion simulation — jittable, vmappable, explicit PRNG.

Behavior tracks the reference pipeline (src/utils/motion_utils.py:121-202):

1. FFT the clean complex image.
2. Draw a movement count n (or use a fixed one) and a sorted list of band
   start columns with minimum gap W // n (``generate_list``,
   motion_utils.py:7-24).
3. Per movement: integer rotation and (x, y) shift in [-10, 10) with 0
   remapped to 1 (``get_rand_int``, motion_utils.py:27-34); build the affine
   with the rotation inserted and the translation divided by (2*W - 1)
   (motion_utils.py:159-163 — the reference normalizes both components by
   the *width* because it indexes ``image[0, ...].shape``); warp Re and Im
   separately with bilinear/border/align_corners=False sampling on an
   align_corners=True affine grid (motion_utils.py:165-182).
4. Replace k-space columns [start, start + w) (w in [1, 10)) with the warped
   image's FFT; later movements overwrite earlier ones on overlap.

TPU-first differences from the reference (documented, behavior-preserving):

- All ``max_movements`` candidate warps + FFTs run *batched*; movements with
  index >= n are masked out. Static shapes throughout — one compiled graph
  serves every (n, positions) draw.
- The sequential column overwrites become a per-column "owner" argmax
  (owner = highest movement index covering the column), which reproduces
  last-write-wins exactly.
- ``generate_list``'s permutation construction is replaced by an equivalent
  sampler: steps ~ U[0, slack), then n sorted draws from U[0, steps]
  (stars-and-bars positions), plus the mingap ramp. Same support, near-
  identical distribution, no dynamic shapes.

The ACS fraction the reference computes but never uses (motion_utils.py:136)
is intentionally omitted.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import MotionSimConfig
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample  # noqa: F401
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm


class MotionSample(NamedTuple):
    kspace: jnp.ndarray  # (H, W) complex64 — corrupted k-space
    mask: jnp.ndarray  # (H, W) int32 — 1 on corrupted columns
    rotations: jnp.ndarray  # (max_movements,) float32, 0 beyond n
    translations: jnp.ndarray  # (max_movements, 2) float32, 0 beyond n
    n_movements: jnp.ndarray  # () int32


def _rand_nonzero_int(key, shape, lo, hi):
    """randint in [lo, hi) with 0 remapped to 1 (reference get_rand_int)."""
    x = jax.random.randint(key, shape, lo, hi)
    return jnp.where(x == 0, 1, x)


def _band_starts(key, width, n, max_movements):
    """Sorted band start columns with min gap width//n (generate_list)."""
    k1, k2 = jax.random.split(key)
    mingap = width // n
    slack = jnp.maximum(width - mingap * (n - 1), 1)
    steps = jax.random.randint(k1, (), 0, slack)
    draws = jax.random.randint(k2, (max_movements,), 0, steps + 1)
    c = jnp.sort(draws)
    return c + mingap * jnp.arange(max_movements)


def simulate_motion_2d(
    key: jax.Array,
    image: jnp.ndarray,
    n_movements: Optional[jnp.ndarray] = None,
    cfg: MotionSimConfig = MotionSimConfig(),
    max_movements: int = 20,
) -> MotionSample:
    """Corrupt one complex (H, W) image with rigid per-band motion."""
    h, w = image.shape
    keys = jax.random.split(key, 6)

    if n_movements is None:
        n = _rand_nonzero_int(keys[0], (), *cfg.n_movements_range)
    else:
        n = jnp.asarray(n_movements, jnp.int32)

    starts = _band_starts(keys[1], w, n, max_movements)  # (M,)
    widths = jax.random.randint(keys[2], (max_movements,), *cfg.width_range)
    angles = _rand_nonzero_int(
        keys[3], (max_movements,), *cfg.rotate_range
    ).astype(jnp.float32)
    shifts = _rand_nonzero_int(
        keys[4], (max_movements, 2), *cfg.shift_range
    ).astype(jnp.float32)

    active = jnp.arange(max_movements) < n  # (M,)

    # Affines: rotation + translation/(2W - 1), reference normalization quirk.
    rad = jnp.deg2rad(angles)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    theta = jnp.stack(
        [
            jnp.stack([cos, -sin, shifts[:, 0] / (2.0 * w - 1.0)], -1),
            jnp.stack([sin, cos, shifts[:, 1] / (2.0 * w - 1.0)], -1),
        ],
        axis=1,
    )  # (M, 2, 3)

    grids = affine_grid(theta, (h, w), align_corners=True)  # (M, H, W, 2)
    # One-hot matmul warp (MXU; gathers are pathologically slow on TPU —
    # see ops/warp_mm.py); border padding semantics match grid_sample's.
    warped = bilinear_sample_mm(
        image, grids, align_corners=False, padding_mode="border"
    )  # (M, H, W) complex

    ksp_clean = fft2c(image)
    ksp_warped = fft2c(warped)  # (M, H, W)

    # Column ownership: highest active movement index covering the column
    # wins (last-write-wins of the reference's sequential loop).
    col = jnp.arange(w)
    ends = starts + widths
    covers = (
        active[:, None]
        & (col[None, :] >= starts[:, None])
        & (col[None, :] < ends[:, None])
    )  # (M, W)
    midx = jnp.arange(1, max_movements + 1, dtype=jnp.int32)
    owner = jnp.max(jnp.where(covers, midx[:, None], 0), axis=0)  # (W,)

    stack = jnp.concatenate([ksp_clean[None], ksp_warped], axis=0)
    ksp_out = jnp.take_along_axis(
        stack, jnp.broadcast_to(owner[None, None, :], (1, h, w)), axis=0
    )[0]
    mask = jnp.broadcast_to((owner > 0)[None, :], (h, w)).astype(jnp.int32)

    zeros_m = jnp.where(active, 1.0, 0.0)
    return MotionSample(
        kspace=ksp_out,
        mask=mask,
        rotations=angles * zeros_m,
        translations=shifts * zeros_m[:, None],
        n_movements=n,
    )


def simulate_motion_batch(key, images, n_movements=None, cfg=MotionSimConfig(), max_movements=20):
    """vmap over a (B, H, W) batch of complex images."""
    keys = jax.random.split(key, images.shape[0])
    fn = lambda k, im: simulate_motion_2d(
        k, im, n_movements=n_movements, cfg=cfg, max_movements=max_movements
    )
    return jax.vmap(fn)(keys, images)
