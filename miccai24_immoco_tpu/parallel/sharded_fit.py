"""Batched, device-sharded IM-MoCo instance fits.

The reference processes slices strictly sequentially on one GPU
(test_immoco.py:45-72).  Here a batch of independent per-slice fits runs as
one ``vmap``-ed, ``jit``-ed program over a (dp, tp) mesh:

- dp: the slice batch is sharded across devices; each device runs its
  slices' 200-iteration fits with optimizer state resident in local HBM —
  zero cross-device traffic on this axis.
- tp: inside every fit, the MOVEMENT axis is model-parallel
  (``tp_constraints``): the movement-group masks, the Motion INR's
  movement-leading lattice grids (and, for hash encoding, the Image INR's
  hash tables over the table axis) carry GSPMD sharding constraints, so
  each tp shard computes its movements' displacement fields, warps and
  FFTs — the dominant per-iteration FLOPs, which scale linearly in
  movement count — and XLA inserts one psum for the mask-composed k-space
  sum plus the matching collectives in the backward.  Constraints are
  re-applied after every optimizer update so the layout is loop-invariant.
  Numeric equivalence tp=2 == tp=1 is asserted in tests/test_parallel.py.

This module is exercised on an 8-device virtual CPU mesh in
tests/test_parallel.py and via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miccai24_immoco_tpu.config import InstanceFitConfig
from miccai24_immoco_tpu.models.immoco import (
    FitResult,
    IMMoCoModel,
    build_immoco,
    make_instance_fit,
)


def make_batched_fit(model: IMMoCoModel, **fit_kwargs) -> Callable:
    """(B,H,W) kspace, (B,M,H,W) masks, (B,2) keys, statics -> FitResult.

    statics (model.statics) is shared across the batch (in_axes=None) and
    must be passed as an argument per the statics discipline (models/inr.py).
    """
    fit = make_instance_fit(model, **fit_kwargs)
    return jax.vmap(fit, in_axes=(0, 0, 0, None))


def tp_constraints(model: IMMoCoModel, mesh: Mesh):
    """(constrain_params, constrain_masks) GSPMD hooks for movement-axis
    tensor parallelism (see module docstring).  No-ops when tp == 1.

    Sharded leaves:
      - masks (M, H, W):                           P('tp', None, None)
      - Motion INR lattice level grids whose leading (movement) axis spans
        the full movement count:                   P('tp', ...)
      - Image INR hash tables (L, T, F), if any:   P(None, 'tp', None)
        (the table axis is the HBM-scaling axis for volumetric variants)
    Everything else is left to GSPMD propagation.  Constraints compose with
    vmap (the slice-batch dim is inserted unconstrained -> dp comes from the
    jit in_shardings).
    """
    if mesh.shape.get("tp", 1) == 1:
        return None, None
    m_total = model.cfg.max_movements

    def _constrain_params(params):
        params = dict(params)
        motion = dict(params["motion"])
        enc = dict(motion["enc"])
        if "levels" in enc:
            enc["levels"] = tuple(
                jax.lax.with_sharding_constraint(
                    g,
                    NamedSharding(
                        mesh, P("tp", *([None] * (g.ndim - 1)))
                    ),
                )
                if g.shape[0] == m_total
                else g
                for g in enc["levels"]
            )
        motion["enc"] = enc
        params["motion"] = motion
        image = dict(params["image"])
        ienc = image.get("enc")
        if isinstance(ienc, jnp.ndarray) and ienc.ndim == 3:
            image["enc"] = jax.lax.with_sharding_constraint(
                ienc, NamedSharding(mesh, P(None, "tp", None))
            )
            params["image"] = image
        return params

    def _constrain_masks(masks):
        return jax.lax.with_sharding_constraint(
            masks, NamedSharding(mesh, P("tp", None, None))
        )

    return _constrain_params, _constrain_masks


def make_sharded_fit(model: IMMoCoModel, mesh: Mesh) -> Callable:
    """Batched fit with explicit dp sharding (and movement-axis tp via
    ``tp_constraints``) over the mesh.

    The batch must be divisible by the dp axis size.  Inputs may live on
    host or any device; jit re-shards them to the declared shardings.
    statics are replicated across the mesh.
    """
    cp, cm = tp_constraints(model, mesh)
    vfit = make_batched_fit(
        model, constrain_params=cp, constrain_masks=cm
    )

    dp3 = NamedSharding(mesh, P("dp", None, None))
    dp4 = NamedSharding(mesh, P("dp", None, None, None))
    dp2 = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    statics_sh = jax.tree.map(lambda _: repl, model.statics)

    return jax.jit(
        vfit,
        in_shardings=(dp3, dp4, dp2, statics_sh),
        out_shardings=FitResult(image=dp3, kspace_forward=dp3, losses=dp2),
    )


def make_batched_segmented_fit(
    model: IMMoCoModel, segment_len: int = 25, mesh: Optional[Mesh] = None
) -> Callable:
    """Batched fits advanced in fixed-length compiled segments.

    For runtimes that bound single-program execution time: one executable
    advances the whole batch by ``segment_len`` iterations; the host loops
    segments.  Numerically identical to make_batched_fit (same scan body).
    Returns run(kspaces, masks, keys, statics) -> FitResult.
    """
    from miccai24_immoco_tpu.models.immoco import (
        _coarse_lambda_scale,
        _scale_coarse_sched,
        fit_schedule,
        fit_windows,
        make_segmented_fit,
    )

    single = make_segmented_fit(model, segment_len)
    cfg = model.cfg

    vinit = jax.jit(jax.vmap(single.init_fn, in_axes=(0, 0, None)))
    vseg = jax.jit(
        jax.vmap(single.segment_fn, in_axes=(0, 0, 0, 0, None, None))
    )
    vseg_phase = tuple(
        jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None)))
        for fn in single.phase_segment_fns
    )
    vseg_frozen = (
        jax.jit(
            jax.vmap(single.frozen_segment_fn, in_axes=(0, 0, 0, 0, None, None))
        )
        if single.frozen_segment_fn is not None
        else None
    )
    vfin = jax.jit(jax.vmap(single.finalize_fn, in_axes=(0, 0, 0, 0, None)))
    lam_scales = tuple(
        _coarse_lambda_scale(model, cm) for cm in model.coarse_levels
    )

    @jax.jit
    def vdisp(params, masks, statics):
        """Per-slice mean fitted |displacement| in pixels, weighted over
        real (non-empty-mask) movement groups — the self-supervised
        degenerate-motion-basin signal (PERFORMANCE.md failing-heavy
        attribution: degenerate fits show a uniform ~7 px mean field on
        every group vs ~2 px for healthy fits)."""

        def one(p, m):
            p = p["p"] if isinstance(p, dict) and "p" in p else p
            _, _, _, mot = model.sample_grids(p, m, statics, with_motion=True)
            w = jnp.clip(m.sum(axis=(-2, -1)), 0.0, 1.0)
            return (mot["px_mean"] * w).sum() / jnp.maximum(w.sum(), 1.0)

        return jax.vmap(one)(params, masks)

    def run(kspaces, masks, keys, statics, with_diag: bool = False):
        lambdas = fit_schedule(cfg)
        params, opt_state, k_in, scale = vinit(kspaces, keys, statics)
        losses = []
        for s, e, phase in fit_windows(cfg, segment_len):
            seg = lambdas[s:e]
            if phase >= 0:
                seg = _scale_coarse_sched(seg, lam_scales[phase])
            fn = (vseg_phase[phase] if phase >= 0
                  else (vseg_frozen if phase == -2 else vseg))
            params, opt_state, l = fn(
                params, opt_state, k_in, masks, jnp.asarray(seg), statics
            )
            losses.append(l)
        image, k_fwd = vfin(params, k_in, masks, scale, statics)
        result = FitResult(
            image=image,
            kspace_forward=k_fwd,
            losses=jnp.concatenate(losses, axis=-1),
        )
        if with_diag:
            return result, {"mean_disp_px": vdisp(params, masks, statics)}
        return result

    return run


def batched_motion_correct(
    kspaces: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: InstanceFitConfig = InstanceFitConfig(),
    mesh: Optional[Mesh] = None,
    key: Optional[jax.Array] = None,
) -> FitResult:
    """Convenience API: fit a (B, H, W) batch, optionally mesh-sharded."""
    b, h, w = kspaces.shape
    model = build_immoco(cfg, h, w)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, b)
    if mesh is None:
        run = jax.jit(make_batched_fit(model))
    else:
        run = make_sharded_fit(model, mesh)
    return run(kspaces, masks.astype(jnp.float32), keys, model.statics)
