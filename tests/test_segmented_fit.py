"""Segmented fit must be numerically identical to the single-graph fit."""

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.models.immoco import (
    build_immoco,
    make_instance_fit,
    make_segmented_fit,
)
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.data.synthetic import phantom_stack

import sys

sys.path.insert(0, "tests")
from test_immoco_fit import small_cfg  # noqa: E402


def test_ema_segmented_matches_single_graph():
    """cfg.ema_decay > 0: the EMA carry must survive segment boundaries
    bit-identically, and the averaged output must differ from final-iterate
    parity (it is a different, deliberately divergent estimator)."""
    import dataclasses

    from miccai24_immoco_tpu.parallel.sharded_fit import (
        make_batched_segmented_fit,
    )

    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    base = small_cfg("lattice", "lattice", iters=11, max_movements=4)
    cfg = dataclasses.replace(base, ema_decay=0.9, ema_start_frac=0.5)
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    key = jax.random.PRNGKey(7)

    model = build_immoco(cfg, 32, 32)
    one = jax.jit(make_instance_fit(model))(
        sim.kspace, masks, key, model.statics
    )
    seg = make_segmented_fit(model, segment_len=4)(
        sim.kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(seg.image)), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )
    batched = make_batched_segmented_fit(model, segment_len=4)(
        sim.kspace[None], masks[None], key[None], model.statics
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(batched.image[0])), np.asarray(jnp.abs(one.image)),
        rtol=1e-4, atol=1e-4,
    )

    ref_model = build_immoco(base, 32, 32)
    ref = jax.jit(make_instance_fit(ref_model))(
        sim.kspace, masks, key, ref_model.statics
    )
    # Same losses trajectory (EMA is output-only), different output image.
    np.testing.assert_allclose(
        np.asarray(one.losses), np.asarray(ref.losses), rtol=1e-5, atol=1e-5
    )
    assert float(jnp.abs(one.image - ref.image).max()) > 1e-6


def test_segmented_matches_single_graph():
    img = phantom_stack(1, 32, 32, seed=6)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(0), img, n_movements=2)
    cfg = small_cfg("lattice", "lattice", iters=11, max_movements=4)
    masks, _ = extract_movement_groups(sim.mask[0], 32, 4)
    model = build_immoco(cfg, 32, 32)

    key = jax.random.PRNGKey(7)
    one = jax.jit(make_instance_fit(model))(sim.kspace, masks, key, model.statics)
    seg = make_segmented_fit(model, segment_len=4)(
        sim.kspace, masks, key, model.statics
    )
    np.testing.assert_allclose(
        np.asarray(seg.losses), np.asarray(one.losses), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.abs(seg.image)),
        np.asarray(jnp.abs(one.image)),
        rtol=1e-4,
        atol=1e-4,
    )
