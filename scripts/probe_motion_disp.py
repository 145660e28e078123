"""Fitted-motion magnitude diagnosis for the failing heavy slices.

PERFORMANCE.md (round 2) attributes slices 1/11 of the 50-slice seed-2024
heavy corpus to a *mild-corruption draw*: 18 detected groups but near-zero
effective displacement, where the fit's INR content costs more than ghost
removal gains.  Two competing mechanisms predict different fixes:

  (a) motion-INR degeneracy — the fit INVENTS motion on still groups; a
      displacement-magnitude regularizer (and/or a motion-gated DC that
      keeps measured columns for ~still groups) would rescue it;
  (b) honest small-motion fit — the fitted displacements ARE near zero and
      the damage comes from the Image INR's smoothing on the replaced
      columns; only a motion-gated DC (keep measured data where fitted
      motion ~ 0) helps.

This probe measures, per movement group of each slice:

  - TRUE corruption: relative k-space error of the measured columns vs the
    clean spectrum, err_m = ||(K_mot - K_gt) m_g|| / ||K_gt m_g||
    (the corpus keeps the pre-corruption image, so truth is available);
  - FITTED motion: mean / max |displacement| in pixels over the motion
    lattice after the full 200-iteration fit (params exposed by
    make_segmented_fit's host-visible segment loop).

Usage: python scripts/probe_motion_disp.py [idx,idx,...] [n_corpus]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    fit_schedule,
    fit_windows,
    make_segmented_fit,
    _coarse_lambda_scale,
    _scale_coarse_sched,
)
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def main():
    idxs = [
        int(i)
        for i in (sys.argv[1] if len(sys.argv) > 1 else "1,11,16").split(",")
    ]
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    size = 320
    n_mov = 18

    corpus = _synthetic_corpus(n_corpus, size, "heavy", seed=2024)

    cfg = InstanceFitConfig(
        iters=200,
        max_movements=n_mov,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl="pallas_tiled",
        compute_dtype="bfloat16",
        motion_res_factor=2,
    )
    model = build_immoco(cfg, size, size)
    single = make_segmented_fit(model, segment_len=50)
    vinit = jax.jit(jax.vmap(single.init_fn, in_axes=(0, 0, None)))
    vseg = jax.jit(
        jax.vmap(single.segment_fn, in_axes=(0, 0, 0, 0, None, None))
    )
    vseg_phase = tuple(
        jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None)))
        for fn in single.phase_segment_fns
    )
    lam_scales = tuple(
        _coarse_lambda_scale(model, cm) for cm in model.coarse_levels
    )

    @jax.jit
    def disp_stats(params, statics):
        """Per-movement (mean_px, max_px) of the fitted displacement field
        on the motion lattice (mirrors IMMoCoModel.forward's bounded-tanh
        displacement construction, models/immoco.py:151-199)."""
        mi = model.motion_inr
        if mi.apply_cf is not None:
            d = jnp.tanh(mi.apply_cf(params["motion"], statics["motion"]))
            # (2, M, mh, mw), channel 0 = x, 1 = y
            dx, dy = d[0], d[1]
        else:
            d = jnp.tanh(mi.apply(params["motion"], statics["motion"]))
            dx, dy = d[..., 0], d[..., 1]
        px = float(cfg.motion_disp_px)
        mag = jnp.sqrt((dx * px) ** 2 + (dy * px) ** 2)  # (M, mh, mw) px
        return mag.mean(axis=(-2, -1)), mag.max(axis=(-2, -1))

    @jax.jit
    def group_err(k_mot, k_gt, masks):
        num = jnp.sqrt(
            (jnp.abs((k_mot - k_gt))[None] ** 2 * masks).sum(axis=(-2, -1))
        )
        den = jnp.sqrt((jnp.abs(k_gt)[None] ** 2 * masks).sum(axis=(-2, -1)))
        return num / jnp.maximum(den, 1e-12)

    sub_ks = corpus["kspace_motion"][np.asarray(idxs)]
    sub_gt = corpus["image_rss"][np.asarray(idxs)]
    sub_mask = corpus["mask"][np.asarray(idxs)]

    masks = []
    for j in range(len(idxs)):
        m, ng = extract_movement_groups(
            jnp.asarray(sub_mask[j][0] > 0), size, cfg.max_movements
        )
        masks.append(m)
        print(f"slice {idxs[j]}: {int(ng)} true groups", flush=True)
    masks = jnp.stack(masks)

    ksp = put_complex(sub_ks)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(0), jnp.asarray(idxs)
    )
    lambdas = fit_schedule(cfg)
    params, opt_state, k_in, scale = vinit(ksp, keys, model.statics)
    for s, e, phase in fit_windows(cfg, 50):
        seg = lambdas[s:e]
        if phase >= 0:
            seg = _scale_coarse_sched(seg, lam_scales[phase])
        fn = vseg_phase[phase] if phase >= 0 else vseg
        params, opt_state, _ = fn(
            params, opt_state, k_in, masks, jnp.asarray(seg), model.statics
        )

    p = params["p"] if isinstance(params, dict) and "p" in params else params
    mean_px, max_px = jax.vmap(disp_stats, in_axes=(0, None))(
        p, model.statics
    )
    mean_px, max_px = readback(mean_px), readback(max_px)

    k_gt = fft2c(put_complex(sub_gt))
    errs = readback(jax.vmap(group_err)(ksp, k_gt, masks))
    col_counts = readback(masks.sum(axis=(-2, -1)) / size)

    for j, i in enumerate(idxs):
        print(f"\nslice {i}: group | cols | true_kerr | fit_mean_px | fit_max_px")
        for g in range(cfg.max_movements):
            if col_counts[j][g] < 0.5:
                continue
            print(
                f"  {g:2d} | {col_counts[j][g]:4.0f} | {errs[j][g]:9.4f} |"
                f" {mean_px[j][g]:10.3f} | {max_px[j][g]:9.3f}",
                flush=True,
            )
        real = col_counts[j] >= 0.5
        print(
            f"  summary: median true_kerr {np.median(errs[j][real]):.4f}, "
            f"median fit_mean_px {np.median(mean_px[j][real]):.3f}"
        )


if __name__ == "__main__":
    main()
