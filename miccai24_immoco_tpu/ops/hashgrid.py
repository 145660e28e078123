"""Multiresolution hash-grid encoding (Instant-NGP style), pure XLA.

Re-implements the capability of tiny-cuda-nn's ``Grid``/``Hash`` encoding used
by the reference INRs (src/models/immoco.py:27-37,60-65): L levels of feature
grids with geometrically growing resolution; coarse levels are stored densely,
fine levels through a spatial hash into a 2^log2_hashmap_size-entry table;
features are d-linearly interpolated and concatenated across levels.

Design notes (TPU-first, not a CUDA translation):

- Everything is expressed as batched ``take`` gathers over a single flattened
  (L*T, F) parameter array, which XLA lowers to efficient TPU gathers; the
  transpose (scatter-add into the tables) comes out of autodiff for free.
- Query coordinates follow the *reference's* convention: inputs live in
  [-1, 1] (the reference feeds affine_grid/meshgrid coordinates straight into
  tcnn, immoco.py:78-85). We map them to [0, 1] internally.
- Corner indices and interpolation weights depend only on the coordinates.
  For instance fits the coordinates are fixed across all 200 Adam iterations,
  so ``precompute_corners`` exposes them as a static cache that is computed
  once and reused by every step of the ``lax.scan`` — removing all hashing
  work from the hot loop (the reference recomputes it every tcnn launch).

The spatial hash is the Instant-NGP one: XOR of per-dimension coordinates
multiplied by large primes (pi_1 = 1, pi_2 = 2654435761, pi_3 = 805459861),
masked to the table size (power of two).
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.config import HashGridConfig

_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(cfg: HashGridConfig) -> Tuple[int, ...]:
    return tuple(cfg.level_resolution(l) for l in range(cfg.num_levels))


def init_hash_tables(key, cfg: HashGridConfig) -> jnp.ndarray:
    """(L, T, F) feature tables ~ U(-init_scale, init_scale), fp32."""
    return jax.random.uniform(
        key,
        (cfg.num_levels, cfg.table_size, cfg.features_per_level),
        minval=-cfg.init_scale,
        maxval=cfg.init_scale,
        dtype=jnp.float32,
    )


def _corner_offsets(dims: int) -> np.ndarray:
    """(2^d, d) array of hypercube corner offsets in {0, 1}."""
    return np.array(list(itertools.product((0, 1), repeat=dims)), dtype=np.int32)


def _level_indices(corners: jnp.ndarray, res: int, cfg: HashGridConfig):
    """Map integer corner coordinates (N, 2^d, d) to table indices (N, 2^d).

    Dense linear indexing when the level grid fits in the table, spatial
    hashing otherwise (Instant-NGP collision policy).
    """
    dims = corners.shape[-1]
    if res**dims <= cfg.table_size:
        idx = corners[..., 0].astype(jnp.uint32)
        stride = 1
        for d in range(1, dims):
            stride *= res
            idx = idx + corners[..., d].astype(jnp.uint32) * jnp.uint32(stride)
        return idx.astype(jnp.int32)
    h = corners[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    for d in range(1, dims):
        h = h ^ (corners[..., d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d]))
    return (h & jnp.uint32(cfg.table_size - 1)).astype(jnp.int32)


def precompute_corners(coords: jnp.ndarray, cfg: HashGridConfig):
    """Static gather plan for a fixed query set.

    Args:
      coords: (N, d) query points in [-1, 1].

    Returns:
      indices: (L, N, 2^d) int32 — flat indices into each level's table.
      weights: (L, N, 2^d) float32 — d-linear interpolation weights.
    """
    coords = jax.lax.stop_gradient(coords)
    n, dims = coords.shape
    offsets = jnp.asarray(_corner_offsets(dims))  # (C, d)
    u = (coords + 1.0) * 0.5

    all_idx = []
    all_w = []
    for level, res in enumerate(level_resolutions(cfg)):
        pos = jnp.clip(u, 0.0, 1.0) * (res - 1)
        base = jnp.floor(pos)
        t = pos - base  # (N, d)
        corners = base[:, None, :].astype(jnp.int32) + offsets[None]  # (N,C,d)
        corners = jnp.clip(corners, 0, res - 1)
        idx = _level_indices(corners, res, cfg)  # (N, C)
        w = jnp.prod(
            jnp.where(offsets[None].astype(bool), t[:, None, :], 1.0 - t[:, None, :]),
            axis=-1,
        )  # (N, C)
        all_idx.append(idx)
        all_w.append(w)
    return jnp.stack(all_idx), jnp.stack(all_w)


def encode_with_plan(tables: jnp.ndarray, indices: jnp.ndarray, weights: jnp.ndarray):
    """Interpolate features using a precomputed gather plan.

    Args:
      tables:  (L, T, F) parameters.
      indices: (L, N, C) int32, C = 2^d.
      weights: (L, N, C) float32.

    Returns:
      (N, L*F) concatenated per-level features.
    """
    l, t, f = tables.shape
    _, n, c = indices.shape
    # One flat gather over all levels: offset each level's indices by l*T.
    flat = tables.reshape(l * t, f)
    offs = (jnp.arange(l, dtype=jnp.int32) * t)[:, None, None]
    gathered = jnp.take(flat, (indices + offs).reshape(-1), axis=0)
    gathered = gathered.reshape(l, n, c, f)
    feats = jnp.sum(gathered * weights[..., None], axis=2)  # (L, N, F)
    return jnp.moveaxis(feats, 0, 1).reshape(n, l * f)


def hash_encode(tables: jnp.ndarray, coords: jnp.ndarray, cfg: HashGridConfig):
    """One-shot encoding for dynamic query points: (N, d) -> (N, L*F)."""
    indices, weights = precompute_corners(coords, cfg)
    return encode_with_plan(tables, indices, weights)
