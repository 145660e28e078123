"""Separable lattice encoding — the TPU-native INR feature backbone.

Both IM-MoCo INRs only ever query *fixed regular lattices* (reference
immoco.py:72-80: the identity affine grid and a (movements, H, W) meshgrid,
both built from linspace(-1, 1, s) per axis).  Sampling a dense level grid at
such a lattice is a separable linear map, so each level evaluates as a chain
of tiny interpolation matmuls — pure MXU work, zero gathers — instead of the
random-access hash-table lookups tiny-cuda-nn does on GPU.

Levels whose dense size would exceed the reference hash-table budget (the
"hashed" levels, which at super-Nyquist resolution act as per-query-point
random features) are folded into explicit per-lattice-point fine features,
which strictly subsume them on a fixed lattice.

Equivalence to the hash grid on dense levels is exact (same d-linear
interpolation; tested in tests/test_encoding.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.config import LatticeEncodingConfig


def plan_levels(
    cfg: LatticeEncodingConfig, lattice_shape: Sequence[int]
) -> Tuple[List[Tuple[int, ...]], int]:
    """Decide dense level grid shapes and the folded fine-feature width.

    Per-axis resolution is capped at the lattice extent along that axis
    (extra nodes between fixed query points add no rank). Levels whose total
    entry count would exceed ``dense_entry_budget`` are folded into fine
    per-point features.
    """
    shapes: List[Tuple[int, ...]] = []
    folded = 0
    for level in range(cfg.num_levels):
        r = int(cfg.base_resolution * (cfg.per_level_scale**level))
        shape = tuple(min(r, s) for s in lattice_shape)
        if int(np.prod(shape)) <= cfg.dense_entry_budget and shape not in shapes:
            shapes.append(shape)
        else:
            folded += 1
    if cfg.fine_features < 0:
        fine = cfg.features_per_level * folded
    else:
        fine = cfg.fine_features
    return shapes, fine


def init_lattice_params(key, cfg: LatticeEncodingConfig, lattice_shape):
    """Parameters: per-level dense grids + optional per-point fine features."""
    shapes, fine = plan_levels(cfg, lattice_shape)
    keys = jax.random.split(key, len(shapes) + 1)
    levels = tuple(
        jax.random.uniform(
            k,
            (*shape, cfg.features_per_level),
            minval=-cfg.init_scale,
            maxval=cfg.init_scale,
            dtype=jnp.float32,
        )
        for k, shape in zip(keys[:-1], shapes)
    )
    fine_feats = None
    if fine > 0:
        # Stored channel-FIRST (fine, *lattice): the hot (TPU) encode path is
        # channel-first and these are full-lattice-sized — storing them in the
        # consumed layout avoids a full-size transpose every fit iteration.
        fine_feats = jax.random.uniform(
            keys[-1],
            (fine, *lattice_shape),
            minval=-cfg.init_scale,
            maxval=cfg.init_scale,
            dtype=jnp.float32,
        )
    return {"levels": levels, "fine": fine_feats}


def feature_width(cfg: LatticeEncodingConfig, lattice_shape) -> int:
    shapes, fine = plan_levels(cfg, lattice_shape)
    return len(shapes) * cfg.features_per_level + fine


def _interp_matrix(n_out: int, r: int) -> np.ndarray:
    """(n_out, r) linear-interpolation matrix from an r-node grid spanning
    [-1, 1] to n_out lattice queries at linspace(-1, 1, n_out).

    Matches the hash grid's per-axis lerp: pos = u * (r - 1), u in [0, 1].
    """
    a = np.zeros((n_out, r), dtype=np.float32)
    if n_out == 1:
        u = np.zeros(1)
    else:
        u = np.arange(n_out) / (n_out - 1)
    pos = u * (r - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, max(r - 2, 0))
    t = (pos - lo).astype(np.float32)
    a[np.arange(n_out), lo] = 1.0 - t
    if r > 1:
        a[np.arange(n_out), np.minimum(lo + 1, r - 1)] += t
    return a


def lattice_plan(cfg: LatticeEncodingConfig, lattice_shape, param_shape=None):
    """Static per-level, per-axis interpolation matrices.

    ``param_shape``: the lattice whose ``plan_levels`` define the PARAMETER
    grids, when it differs from the query lattice — cross-resolution
    evaluation (a coarse-raster model evaluating full-resolution parameters;
    models/immoco.py coarse-to-fine fit).  Level grids are then resampled at
    the query points through the same hat-interpolation matrices, and the
    per-point fine features (tied to ``param_shape``) gain their own interp
    matrices ("fine" entry) — they behave as one more dense level.
    """
    src = tuple(param_shape) if param_shape is not None else tuple(lattice_shape)
    shapes, fine = plan_levels(cfg, src)
    levels = []
    for shape in shapes:
        levels.append(
            tuple(
                jnp.asarray(_interp_matrix(n_out, r))
                for n_out, r in zip(lattice_shape, shape)
            )
        )
    fine_mats = None
    if fine > 0 and src != tuple(lattice_shape):
        fine_mats = tuple(
            jnp.asarray(_interp_matrix(n_out, r))
            for n_out, r in zip(lattice_shape, src)
        )
    return {"levels": tuple(levels), "fine": fine_mats}


def _is_identity(a: np.ndarray) -> bool:
    return a.shape[0] == a.shape[1] and bool(
        np.array_equal(a, np.eye(a.shape[0], dtype=a.dtype))
    )


def _cf_mats(lattice_shape, shape):
    """Per-axis cf interpolation matrices with prefix-identity skips."""
    mats = []
    contracted = False
    for n_out, r in zip(lattice_shape, shape):
        a = _interp_matrix(n_out, r)
        # Identity skips are only safe as a PREFIX (before the first
        # contraction): contracted outputs append at the end of the dim
        # order, so a skipped axis after a contracted one would land out
        # of order.  All IM-MoCo lattices (movement axis first, finest
        # image levels fully identity) hit the prefix case.
        if not contracted and _is_identity(a):
            mats.append(None)
        else:
            mats.append(jnp.asarray(a))
            contracted = True
    return tuple(mats)


def lattice_plan_cf(cfg: LatticeEncodingConfig, lattice_shape, param_shape=None):
    """Channel-first plan: identity interpolation matrices (axes whose level
    resolution equals the lattice extent — e.g. the movement axis of the
    Motion INR at every level, or the finest image levels) are stored as
    ``None`` so evaluation skips their no-op contraction entirely.

    ``param_shape``: see lattice_plan — cross-resolution evaluation."""
    src = tuple(param_shape) if param_shape is not None else tuple(lattice_shape)
    shapes, fine = plan_levels(cfg, src)
    plan = [_cf_mats(lattice_shape, shape) for shape in shapes]
    fine_mats = None
    if fine > 0 and src != tuple(lattice_shape):
        fine_mats = _cf_mats(lattice_shape, src)
    return {"levels": tuple(plan), "fine": fine_mats}


def _eval_level_cf(grid: jnp.ndarray, mats) -> jnp.ndarray:
    """Channel-FIRST separable resample: (r1..rd, F) level grid ->
    (F, n1..nd) lattice features.

    TPU rationale: the channel-last path's per-axis ``moveaxis`` chains and
    its narrow trailing feature dim (F=2) force lane-padded relayouts of
    full-lattice intermediates on every fit iteration.  Here the feature axis
    is moved up front while the grid is still small, every contraction is a
    single ``dot_general`` whose appended output dim lands in original axis
    order, and all full-size intermediates keep wide trailing dims.
    """
    # Feature axis to the front while the tensor is small.
    return _contract_cf(jnp.moveaxis(grid, -1, 0), mats)


def _contract_cf(g: jnp.ndarray, mats) -> jnp.ndarray:
    """Contract an already channel-first (F, r1..rd) tensor with per-axis
    interp matrices (None = identity prefix skip)."""
    p = 1  # position in g of the next original lattice axis
    for a in mats:
        if a is None:  # identity: leave the axis in place
            p += 1
            continue
        # Contract g axis p against a's node axis; output (n_out) appends
        # at the end, preserving original axis order across the loop.
        g = jax.lax.dot_general(
            g, a, dimension_numbers=(((p,), (1,)), ((), ()))
        )
    return g


def lattice_encode_cf(params, plan_cf) -> jnp.ndarray:
    """Evaluate all levels channel-first: (F_total, *lattice_shape).

    ``params['fine']`` is stored channel-first (see init_lattice_params).
    """
    outs = [
        _eval_level_cf(g, mats)
        for g, mats in zip(params["levels"], plan_cf["levels"])
    ]
    if params["fine"] is not None:
        f = params["fine"]
        if plan_cf["fine"] is not None:
            f = _contract_cf(f, plan_cf["fine"])
        outs.append(f)
    return jnp.concatenate(outs, axis=0)


def _eval_level(grid: jnp.ndarray, mats) -> jnp.ndarray:
    """Resample (r1, ..., rd, F) level grid to the full lattice via separable
    matmuls: out[i1..id, f] = sum A1[i1,r1] ... Ad[id,rd] grid[r1..rd, f]."""
    out = grid
    d = len(mats)
    for axis, a in enumerate(mats):
        # Contract current axis `axis` (all earlier axes already lattice-sized).
        out = jnp.moveaxis(out, axis, 0)
        r = out.shape[0]
        rest = out.shape[1:]
        out = a @ out.reshape(r, -1)
        out = out.reshape((a.shape[0], *rest))
        out = jnp.moveaxis(out, 0, axis)
    return out


def lattice_encode(params, plan) -> jnp.ndarray:
    """Evaluate all levels on the lattice.

    Returns (*lattice_shape, F_total) features (levels concatenated, then
    fine per-point features).
    """
    outs = [
        _eval_level(g, mats)
        for g, mats in zip(params["levels"], plan["levels"])
    ]
    if params["fine"] is not None:
        # Fine features are stored channel-first (see init_lattice_params).
        f = jnp.moveaxis(params["fine"], 0, -1)
        if plan["fine"] is not None:
            f = _eval_level(f, plan["fine"])
        outs.append(f)
    return jnp.concatenate(outs, axis=-1)
