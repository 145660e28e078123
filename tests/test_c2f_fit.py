"""Coarse-to-fine fit (config.py coarse_iters/coarse_size): window split,
cross-resolution parameter compatibility, and segmented/single-graph parity.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import InstanceFitConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    coarse_hw,
    fit_windows,
    make_instance_fit,
    make_segmented_fit,
)
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d

import sys

sys.path.insert(0, "tests")
from test_immoco_fit import small_cfg  # noqa: E402


def c2f_cfg(iters=11, coarse_iters=5, coarse_size=16):
    base = small_cfg("lattice", "lattice", iters=iters, max_movements=4)
    return dataclasses.replace(
        base, coarse_iters=coarse_iters, coarse_size=coarse_size
    )


def test_fit_windows_split():
    # Phase index convention: 0.. = coarse_levels index, -1 = full res.
    cfg = c2f_cfg(iters=11, coarse_iters=5)
    assert fit_windows(cfg, 4) == [
        (0, 4, 0), (4, 5, 0), (5, 9, -1), (9, 11, -1)
    ]
    # No coarse phase: plain segmentation.
    cfg0 = c2f_cfg(iters=11, coarse_iters=0)
    assert fit_windows(cfg0, 4) == [(0, 4, -1), (4, 8, -1), (8, 11, -1)]
    # coarse_iters >= iters: all coarse.
    cfga = c2f_cfg(iters=6, coarse_iters=9)
    assert fit_windows(cfga, 4) == [(0, 4, 0), (4, 6, 0)]
    # Multi-level schedule: one span per phase, boundaries respected.
    cfgm = dataclasses.replace(
        c2f_cfg(iters=12, coarse_iters=0),
        coarse_schedule=((3, 8), (4, 16)),
    )
    assert fit_windows(cfgm, 4) == [
        (0, 3, 0), (3, 7, 1), (7, 11, -1), (11, 12, -1)
    ]


def test_coarse_hw_constraints():
    cfg = c2f_cfg()
    assert coarse_hw(cfg, 32, 32) == (16, 16)
    # Default (coarse_size=0): largest warp-tile multiple <= 0.6 * extent.
    cfg0 = dataclasses.replace(cfg, coarse_size=0)
    hc, wc = coarse_hw(cfg0, 320, 320)
    assert hc == wc and hc % 32 == 0 and hc <= 0.6 * 320


def test_coarse_param_trees_transfer():
    """The coarse companion must init parameter trees with IDENTICAL shapes
    to the full-resolution model (params/opt state carry across the raster
    switch)."""
    cfg = c2f_cfg()
    model = build_immoco(cfg, 32, 32)
    assert model.coarse is not None
    pf = model.init(jax.random.PRNGKey(0))
    pc = model.coarse.init(jax.random.PRNGKey(0))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a.shape, b.shape), pf, pc
    )
    # Same key -> bit-identical init (the c2f fit inits ONCE via model.init).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), pf, pc
    )


def test_c2f_segmented_matches_single_graph():
    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    cfg = c2f_cfg(iters=11, coarse_iters=5, coarse_size=16)
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    model = build_immoco(cfg, 32, 32)

    key = jax.random.PRNGKey(7)
    one = jax.jit(make_instance_fit(model))(
        sim.kspace, masks, key, model.statics
    )
    assert one.losses.shape == (11,)
    assert np.all(np.isfinite(np.asarray(one.losses)))
    seg = make_segmented_fit(model, segment_len=4)(
        sim.kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(seg.losses), np.asarray(one.losses), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(seg.image)), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )


def test_c2f_batched_matches_single():
    from miccai24_immoco_tpu.parallel.sharded_fit import (
        make_batched_segmented_fit,
    )

    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    cfg = c2f_cfg(iters=11, coarse_iters=5, coarse_size=16)
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    model = build_immoco(cfg, 32, 32)
    key = jax.random.PRNGKey(7)
    one = jax.jit(make_instance_fit(model))(
        sim.kspace, masks, key, model.statics
    )
    batched = make_batched_segmented_fit(model, segment_len=4)(
        sim.kspace[None], masks[None], key[None], model.statics
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(batched.image[0])), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )


def test_multilevel_segmented_matches_single_graph():
    """Two-level pyramid (8 -> 16 -> 32): segmented == one-graph scan, and
    the schedule clamps when coarse iters exceed the budget."""
    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    cfg = dataclasses.replace(
        c2f_cfg(iters=12, coarse_iters=0),
        coarse_schedule=((3, 8), (4, 16)),
    )
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    model = build_immoco(cfg, 32, 32)
    assert len(model.coarse_levels) == 2
    assert [cm.height for cm in model.coarse_levels] == [8, 16]
    key = jax.random.PRNGKey(7)
    one = jax.jit(make_instance_fit(model))(
        sim.kspace, masks, key, model.statics
    )
    assert one.losses.shape == (12,)
    assert np.all(np.isfinite(np.asarray(one.losses)))
    seg = make_segmented_fit(model, segment_len=5)(
        sim.kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(seg.losses), np.asarray(one.losses), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(seg.image)), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )
    # Clamping: total coarse iters > cfg.iters trims the tail phase.
    from miccai24_immoco_tpu.models.immoco import coarse_phases

    cfgc = dataclasses.replace(cfg, coarse_schedule=((9, 8), (9, 16)))
    assert coarse_phases(cfgc) == ((9, 8), (3, 16))


def test_c2f_ema_carry():
    """EMA carry interacts with the raster switch: the EMA tree follows the
    same parameterization, so c2f + EMA must run and stay finite."""
    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    cfg = dataclasses.replace(
        c2f_cfg(iters=11, coarse_iters=5), ema_decay=0.9, ema_start_frac=0.5
    )
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    model = build_immoco(cfg, 32, 32)
    key = jax.random.PRNGKey(7)
    one = jax.jit(make_instance_fit(model))(
        sim.kspace, masks, key, model.statics
    )
    seg = make_segmented_fit(model, segment_len=4)(
        sim.kspace, masks, key, model.statics
    )
    assert np.all(np.isfinite(np.asarray(jnp.abs(one.image))))
    np.testing.assert_allclose(
        np.asarray(jnp.abs(seg.image)), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )
