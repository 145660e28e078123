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
