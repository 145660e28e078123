"""Sharded batched-fit tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import MeshConfig
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.parallel.mesh import make_mesh
from miccai24_immoco_tpu.parallel.sharded_fit import batched_motion_correct



def small_cfg(iters=6, max_movements=4):
    from miccai24_immoco_tpu.config import (
        HashGridConfig,
        ImageINRConfig,
        InstanceFitConfig,
        LatticeEncodingConfig,
        MLPConfig,
        MotionINRConfig,
    )

    lat = LatticeEncodingConfig(
        num_levels=4, base_resolution=4, dense_entry_budget=1 << 10
    )
    return InstanceFitConfig(
        iters=iters,
        max_movements=max_movements,
        image_inr=ImageINRConfig(
            encoding="lattice", lattice=lat, mlp=MLPConfig(hidden_width=32)
        ),
        motion_inr=MotionINRConfig(
            encoding="lattice",
            lattice=LatticeEncodingConfig(
                num_levels=4,
                base_resolution=4,
                dense_entry_budget=1 << 10,
                fine_features=0,
            ),
            mlp=MLPConfig(hidden_width=16, activation="tanh"),
        ),
    )


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(MeshConfig(dp=-1, tp=2))
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(MeshConfig(dp=8, tp=1))
    assert mesh.shape == {"dp": 8, "tp": 1}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(dp=3, tp=2))


def _batch(b=8, hw=32):
    images = phantom_stack(b, hw, hw, seed=3)
    sims = simulate_motion_batch(
        jax.random.PRNGKey(0), images, n_movements=2, max_movements=4
    )
    masks = jax.vmap(lambda m: extract_movement_groups(m[0], hw, 4)[0])(sims.mask)
    return sims.kspace, masks


def test_sharded_fit_matches_unsharded():
    ksp, masks = _batch()
    cfg = small_cfg()
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    r_sharded = batched_motion_correct(ksp, masks, cfg, mesh=mesh)
    r_local = batched_motion_correct(ksp, masks, cfg, mesh=None)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(r_sharded.image)),
        np.asarray(jnp.abs(r_local.image)),
        rtol=2e-3,
        atol=2e-3,
    )
    # Output batch axis is actually sharded over dp.
    shard_devs = {d for s in r_sharded.image.addressable_shards for d in [s.device]}
    assert len(shard_devs) == 8 or len(shard_devs) == 4


def test_sharded_fit_dp_only_mesh():
    ksp, masks = _batch()
    mesh = make_mesh(MeshConfig(dp=8, tp=1))
    r = batched_motion_correct(ksp, masks, small_cfg(), mesh=mesh)
    assert np.isfinite(np.asarray(r.losses)).all()
    assert r.image.shape == ksp.shape
