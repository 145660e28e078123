"""Motion-frozen trailing phase (cfg.motion_freeze_iters): frozen means
frozen, segmented matches single-graph, and freeze=0 stays reference
parity."""

import dataclasses
import sys

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    fit_windows,
    make_instance_fit,
    make_segmented_fit,
    phase_spans,
)
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d

sys.path.insert(0, "tests")
from test_immoco_fit import small_cfg  # noqa: E402


def _freeze_cfg(iters=12, freeze=5, **kw):
    base = small_cfg("lattice", "lattice", iters=iters, max_movements=4)
    return dataclasses.replace(
        base,
        motion_disp_px=10.0,
        warp_impl="matmul",
        compute_dtype="float32",
        motion_freeze_iters=freeze,
        motion_freeze_tile_px=16,
        **kw,
    )


def _problem(h=48):
    img = phantom_stack(1, h, h, seed=3)[0]
    sim = simulate_motion_2d(
        jax.random.PRNGKey(1), img, n_movements=3, max_movements=4
    )
    masks, _ = extract_movement_groups(sim.mask[0], h, 4)
    return sim.kspace, masks


def test_phase_spans_with_freeze():
    cfg = _freeze_cfg(iters=12, freeze=5)
    assert phase_spans(cfg) == [(0, 7, -1), (7, 12, -2)]
    # Freeze larger than the full-res remainder clamps.
    cfg = dataclasses.replace(
        _freeze_cfg(iters=12, freeze=50), coarse_schedule=((4, 32),)
    )
    assert phase_spans(cfg) == [(0, 4, 0), (4, 12, -2)]
    # Windows never straddle the freeze boundary.
    cfg = _freeze_cfg(iters=12, freeze=5)
    assert fit_windows(cfg, 4) == [
        (0, 4, -1), (4, 7, -1), (7, 11, -2), (11, 12, -2),
    ]
    # freeze=0: unchanged spans (reference parity).
    assert phase_spans(_freeze_cfg(freeze=0)) == [(0, 12, -1)]


def test_frozen_phase_freezes_motion_params():
    """Motion params after the fit equal their value at the freeze point:
    re-running only the joint prefix must reproduce them exactly."""
    cfg = _freeze_cfg(iters=10, freeze=4)
    kspace, masks = _problem()
    key = jax.random.PRNGKey(0)

    model = build_immoco(cfg, 48, 48)
    run = make_segmented_fit(model, segment_len=3)
    params, opt_state, k_in, _ = run.init_fn(kspace, key, model.statics)
    motion_at_freeze = None
    for s, e, phase in fit_windows(cfg, 3):
        from miccai24_immoco_tpu.models.immoco import fit_schedule

        seg = fit_schedule(cfg)[s:e]
        params, opt_state, _ = run.phase_fn(phase)(
            params, opt_state, k_in, masks, jnp.asarray(seg), model.statics
        )
        if phase == -1:
            motion_at_freeze = params["motion"]
    # Motion params bit-identical across the whole frozen phase.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        motion_at_freeze,
        params["motion"],
    )


def test_frozen_segmented_matches_single_graph():
    cfg = _freeze_cfg(iters=12, freeze=5)
    kspace, masks = _problem()
    key = jax.random.PRNGKey(0)
    model = build_immoco(cfg, 48, 48)
    one = jax.jit(make_instance_fit(model))(kspace, masks, key, model.statics)
    seg = make_segmented_fit(model, segment_len=4)(
        kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(one.losses), np.asarray(seg.losses), rtol=2e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(one.image)), np.asarray(jnp.abs(seg.image)),
        rtol=2e-3, atol=1e-3,
    )


def test_phase_spans_with_duty():
    # Duty (2, 3) over a 12-iteration joint span with a 2-iter frozen tail:
    # joint sub-spans alternate with frozen ones; the span before the tail
    # stays joint (motion fresh entering the tail).
    cfg = _freeze_cfg(iters=14, freeze=2, motion_duty=(2, 3))
    assert phase_spans(cfg) == [
        (0, 2, -1), (2, 5, -2), (5, 7, -1), (7, 10, -2), (10, 12, -1),
        (12, 14, -2),
    ]
    # Duty without a frozen tail still ends on a joint sub-span.
    cfg = _freeze_cfg(iters=10, freeze=0, motion_duty=(2, 3))
    spans = phase_spans(cfg)
    assert spans[-1][2] == -1
    assert spans == [(0, 2, -1), (2, 5, -2), (5, 10, -1)]
    # Total coverage is contiguous and complete either way.
    for cfg in (
        _freeze_cfg(iters=14, freeze=2, motion_duty=(2, 3)),
        _freeze_cfg(iters=10, freeze=0, motion_duty=(3, 2)),
    ):
        spans = phase_spans(cfg)
        assert spans[0][0] == 0 and spans[-1][1] == cfg.iters
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_phase_spans_with_duty_start():
    # motion_duty_start=4: four plain joint iterations lead the span, duty
    # cycling starts after them.
    cfg = _freeze_cfg(iters=16, freeze=2, motion_duty=(2, 3),
                      motion_duty_start=4)
    spans = phase_spans(cfg)
    assert spans[0] == (0, 4, -1)
    assert spans[1] == (4, 6, -1) and spans[2] == (6, 9, -2)
    assert spans[-1] == (14, 16, -2)  # frozen tail intact
    assert spans[0][0] == 0 and spans[-1][1] == cfg.iters
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    # duty_start >= joint span -> pure joint (no cycling), tail intact.
    cfg = _freeze_cfg(iters=12, freeze=2, motion_duty=(2, 3),
                      motion_duty_start=50)
    assert phase_spans(cfg) == [(0, 10, -1), (10, 12, -2)]
    # duty_start without duty is a no-op (reference parity).
    cfg = _freeze_cfg(iters=12, freeze=0, motion_duty=(), motion_duty_start=5)
    assert phase_spans(cfg) == [(0, 12, -1)]


def test_duty_start_segmented_matches_single_graph():
    cfg = _freeze_cfg(iters=14, freeze=2, motion_duty=(2, 2),
                      motion_duty_start=3)
    kspace, masks = _problem()
    key = jax.random.PRNGKey(0)
    model = build_immoco(cfg, 48, 48)
    one = jax.jit(make_instance_fit(model))(kspace, masks, key, model.statics)
    seg = make_segmented_fit(model, segment_len=4)(
        kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(one.losses), np.asarray(seg.losses), rtol=2e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(one.image)), np.asarray(jnp.abs(seg.image)),
        rtol=2e-3, atol=1e-3,
    )


def test_duty_segmented_matches_single_graph():
    cfg = _freeze_cfg(iters=12, freeze=3, motion_duty=(2, 2))
    kspace, masks = _problem()
    key = jax.random.PRNGKey(0)
    model = build_immoco(cfg, 48, 48)
    one = jax.jit(make_instance_fit(model))(kspace, masks, key, model.statics)
    seg = make_segmented_fit(model, segment_len=4)(
        kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(one.losses), np.asarray(seg.losses), rtol=2e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(one.image)), np.asarray(jnp.abs(seg.image)),
        rtol=2e-3, atol=1e-3,
    )


def test_duty_without_freeze_builds_frozen_segment():
    cfg = _freeze_cfg(iters=8, freeze=0, motion_duty=(2, 2))
    kspace, masks = _problem()
    model = build_immoco(cfg, 48, 48)
    run = make_segmented_fit(model, segment_len=4)
    assert run.frozen_segment_fn is not None
    r = run(kspace, masks, jax.random.PRNGKey(0), model.statics)
    assert np.isfinite(np.abs(np.asarray(r.image))).all()


def test_frozen_batched_runs_and_freeze0_is_parity():
    from miccai24_immoco_tpu.parallel.sharded_fit import (
        make_batched_segmented_fit,
    )

    kspace, masks = _problem()
    key = jax.random.PRNGKey(0)

    # freeze=0 goes through the unchanged code path (no frozen segment fn).
    cfg0 = _freeze_cfg(iters=8, freeze=0)
    model0 = build_immoco(cfg0, 48, 48)
    run0 = make_segmented_fit(model0, segment_len=4)
    assert run0.frozen_segment_fn is None
    r0 = run0(kspace, masks, key, model0.statics)

    cfg = _freeze_cfg(iters=8, freeze=3)
    model = build_immoco(cfg, 48, 48)
    batched = make_batched_segmented_fit(model, segment_len=4)(
        kspace[None], masks[None], key[None], model.statics
    )
    single = make_segmented_fit(model, segment_len=4)(
        kspace, masks, key, model.statics
    )
    # vmap-vs-single compile to different fusions; measured drift at this
    # config is max-rel ~2e-3 with freeze=0 AND freeze=3 (identical — the
    # frozen path adds no extra divergence).
    np.testing.assert_allclose(
        np.asarray(jnp.abs(batched.image[0])),
        np.asarray(jnp.abs(single.image)),
        rtol=5e-3, atol=5e-4,
    )
    # The frozen tail changes the estimator (different from freeze=0) but
    # both are finite, sane reconstructions.
    assert np.isfinite(np.abs(np.asarray(r0.image))).all()
    assert np.isfinite(np.abs(np.asarray(single.image))).all()
