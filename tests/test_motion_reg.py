"""Displacement-magnitude regularizer (cfg.lambda_motion) and motion-gated
hard data consistency (cfg.dc_motion_gate_px) — config.py, models/immoco.py.

Both are deliberate divergences (default-off = reference parity); the
failing-heavy-slice diagnosis that motivates them is in PERFORMANCE.md
(scripts/probe_motion_disp.py: a degenerate large-motion basin under heavy
corruption, uniform ~7 px fitted displacement on every group)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    LatticeEncodingConfig,
    MLPConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    fit_schedule,
    fit_windows,
    make_instance_fit,
    make_segmented_fit,
)
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d


def _phantom(h=64, w=64, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(5):
        cy, cx = rng.uniform(0.25, 0.75, 2) * [h, w]
        ry, rx = rng.uniform(0.1, 0.3, 2) * [h, w]
        img += rng.uniform(0.3, 1.0) * np.exp(
            -(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)
        )
    return jnp.asarray(img.astype(np.complex64))


def _cfg(**kw):
    lat = LatticeEncodingConfig(
        num_levels=6, base_resolution=4, dense_entry_budget=1 << 12
    )
    lat_m = dataclasses.replace(lat, fine_features=0)
    return InstanceFitConfig(
        iters=kw.pop("iters", 40),
        max_movements=kw.pop("max_movements", 6),
        image_inr=ImageINRConfig(
            encoding="lattice", lattice=lat,
            mlp=MLPConfig(hidden_width=64, activation="relu"),
        ),
        motion_inr=MotionINRConfig(
            encoding="lattice", lattice=lat_m,
            mlp=MLPConfig(hidden_width=32, activation="tanh"),
        ),
        **kw,
    )


def _corrupted(h=64, w=64):
    img = _phantom(h, w)
    sim = simulate_motion_2d(
        jax.random.PRNGKey(7), img, n_movements=4, max_movements=6
    )
    masks, _ = extract_movement_groups(sim.mask[0] > 0, h, 6)
    return sim.kspace, masks


def _fit_params(cfg, kspace, masks):
    """Drive the segmented fit to completion and return the final params."""
    model = build_immoco(cfg, kspace.shape[-2], kspace.shape[-1])
    single = make_segmented_fit(model, segment_len=10)
    lambdas = fit_schedule(cfg)
    params, opt_state, k_in, scale = single.init_fn(
        kspace, jax.random.PRNGKey(0), model.statics
    )
    for s, e, phase in fit_windows(cfg, 10):
        assert phase < 0
        params, opt_state, _ = single.segment_fn(
            params, opt_state, k_in, masks, jnp.asarray(lambdas[s:e]),
            model.statics,
        )
    return model, params


def _mean_px(model, params, masks):
    _, _, mot = model.forward(params, masks, model.statics, with_motion=True)
    w = jnp.clip(masks.sum(axis=(-2, -1)), 0.0, 1.0)
    return float((mot["px_mean"] * w).sum() / jnp.maximum(w.sum(), 1.0))


def test_motion_stats_shapes_and_padded_rows():
    cfg = _cfg()
    kspace, masks = _corrupted()
    model = build_immoco(cfg, 64, 64)
    params = model.init(jax.random.PRNGKey(1))
    _, _, mot = model.forward(params, masks, model.statics, with_motion=True)
    assert mot["px_mean"].shape == (cfg.max_movements,)
    assert mot["l2"].shape == ()
    assert float(mot["l2"]) > 0.0
    # All-padded masks: the weighted mean has no real groups -> exactly 0.
    _, _, mot0 = model.forward(
        params, jnp.zeros_like(masks), model.statics, with_motion=True
    )
    assert float(mot0["l2"]) == 0.0
    # Default call signature unchanged (reference-parity path).
    k, img = model.forward(params, masks, model.statics)
    assert k.shape == img.shape == (64, 64)


def test_lambda_motion_shrinks_fitted_displacement():
    kspace, masks = _corrupted()
    model0, p0 = _fit_params(_cfg(lambda_motion=0.0), kspace, masks)
    model1, p1 = _fit_params(_cfg(lambda_motion=1e3), kspace, masks)
    d0 = _mean_px(model0, p0, masks)
    d1 = _mean_px(model1, p1, masks)
    assert d1 < 0.5 * d0, (d0, d1)


def test_lambda_motion_anneal_schedule_column():
    from miccai24_immoco_tpu.models.immoco import (
        lambda_motion_schedule,
        use_lam_motion_col,
    )

    cfg = _cfg(iters=40, lambda_motion=100.0, lambda_motion_anneal_frac=0.5)
    assert use_lam_motion_col(cfg)
    lm = lambda_motion_schedule(cfg)
    assert lm.shape == (40,)
    assert lm[0] == 100.0 and lm[20] == 0.0 and lm[-1] == 0.0
    assert np.all(np.diff(lm) <= 0)  # monotone decay
    sched = fit_schedule(cfg)
    assert sched.shape == (40, 2)  # [lambda, lambda_motion] columns
    np.testing.assert_allclose(sched[:, 1], lm)
    # Anneal off -> 1-D schedule (reference-parity shape).
    assert fit_schedule(_cfg(iters=40, lambda_motion=100.0)).ndim == 1
    # Anneal without a lambda_motion weight is inert.
    assert not use_lam_motion_col(_cfg(lambda_motion_anneal_frac=0.5))


def test_lambda_motion_anneal_releases_vs_constant():
    """The annealed fit must pin displacement early but NOT at the end:
    final displacement sits between the constant-high and unregularized
    fits."""
    kspace, masks = _corrupted()
    model0, p0 = _fit_params(_cfg(lambda_motion=0.0), kspace, masks)
    modelc, pc = _fit_params(_cfg(lambda_motion=1e3), kspace, masks)
    modela, pa = _fit_params(
        _cfg(lambda_motion=1e3, lambda_motion_anneal_frac=0.5), kspace, masks
    )
    d0 = _mean_px(model0, p0, masks)
    dc = _mean_px(modelc, pc, masks)
    da = _mean_px(modela, pa, masks)
    assert dc < da, (dc, da)  # release lets motion regrow vs constant
    assert da < d0, (da, d0)  # but the early pin still shapes the fit


def test_segmented_matches_single_with_lambda_motion_anneal():
    kspace, masks = _corrupted()
    cfg = _cfg(iters=20, lambda_motion=50.0, lambda_motion_anneal_frac=0.6)
    model = build_immoco(cfg, 64, 64)
    res_single = make_instance_fit(model)(
        kspace, masks, jax.random.PRNGKey(0), model.statics
    )
    run = make_segmented_fit(model, segment_len=7)
    res_seg = run(kspace, masks, jax.random.PRNGKey(0), model.statics)
    scale = float(jnp.abs(res_single.image).max())
    assert (
        float(jnp.abs(res_single.image - res_seg.image).max()) < 1e-2 * scale
    )
    np.testing.assert_allclose(
        np.asarray(res_single.losses[:3]), np.asarray(res_seg.losses[:3]),
        rtol=1e-4, atol=1e-5,
    )


def test_dc_motion_gate_all_still_keeps_measured_spectrum():
    # With an absurdly large gate every group counts as still: the DC
    # projection keeps the full measured spectrum and the fit output is
    # exactly the corrupted reconstruction (scale round-trips included).
    kspace, masks = _corrupted()
    cfg = _cfg(iters=4, dc_replace=True, dc_motion_gate_px=1e6)
    model = build_immoco(cfg, 64, 64)
    fit = jax.jit(make_instance_fit(model), static_argnums=())
    res = fit(kspace, masks, jax.random.PRNGKey(0), model.statics)
    expect = ifft2c(kspace)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(res.image - expect)).max(),
        0.0,
        atol=2e-2 * float(jnp.abs(expect).max()),
    )


def test_segmented_matches_single_with_lambda_motion():
    # No dc_motion_gate_px here: the hard per-group threshold amplifies the
    # tiny cross-compilation float differences between the single- and
    # segmented-fit executables into a discrete gating flip; the gate's
    # semantics are covered by the extreme-threshold test above.
    kspace, masks = _corrupted()
    cfg = _cfg(iters=20, lambda_motion=5.0, dc_replace=True)
    model = build_immoco(cfg, 64, 64)
    res_single = make_instance_fit(model)(
        kspace, masks, jax.random.PRNGKey(0), model.statics
    )
    run = make_segmented_fit(model, segment_len=7)
    res_seg = run(kspace, masks, jax.random.PRNGKey(0), model.statics)
    # Same math either way, but separately-compiled executables drift a few
    # tenths of a percent over 20 Adam steps of this small chaotic fit (the
    # default config shows the same drift at this scale); bound loosely.
    scale = float(jnp.abs(res_single.image).max())
    assert (
        float(jnp.abs(res_single.image - res_seg.image).max()) < 1e-2 * scale
    )
    np.testing.assert_allclose(
        np.asarray(res_single.losses[:3]), np.asarray(res_seg.losses[:3]),
        rtol=1e-4, atol=1e-5,
    )


def test_motion_stats_with_coarse_motion_lattice():
    """with_motion composes with motion_res_factor > 1 (stats are computed
    on the coarse lattice, before the upsample matmuls) and with the
    channel-first lattice path."""
    cfg = _cfg(motion_res_factor=2, motion_disp_px=10.0)
    kspace, masks = _corrupted()
    model = build_immoco(cfg, 64, 64)
    params = model.init(jax.random.PRNGKey(2))
    k, img, mot = model.forward(params, masks, model.statics, with_motion=True)
    assert mot["px_mean"].shape == (cfg.max_movements,)
    # tanh output scaled by the 10 px cap: per-group means stay within it.
    assert float(mot["px_mean"].max()) <= 10.0 * np.sqrt(2.0) + 1e-3
    assert np.isfinite(float(mot["l2"]))
    # The fit paths run end-to-end under the combined config.
    combo = build_immoco(
        _cfg(iters=4, motion_res_factor=2, motion_disp_px=10.0,
             lambda_motion=1.0, dc_replace=True, dc_motion_gate_px=0.25),
        64, 64,
    )
    res = make_instance_fit(combo)(
        kspace, masks, jax.random.PRNGKey(0), combo.statics
    )
    assert np.isfinite(np.abs(np.asarray(res.image)).max())
