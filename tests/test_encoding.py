"""Hash-grid and lattice encoding tests: interpolation correctness, gradient
flow, and cross-backend agreement on dense levels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    HashGridConfig,
    ImageINRConfig,
    LatticeEncodingConfig,
    MLPConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.ops import hashgrid, lattice
from miccai24_immoco_tpu.models import inr as inr_mod


SMALL = HashGridConfig(num_levels=4, log2_hashmap_size=8, base_resolution=4)


def test_level_resolutions_match_tcnn_formula():
    cfg = HashGridConfig()
    # N_l = floor(16 * 2^l), reference encoding_config (immoco.py:27-37).
    assert hashgrid.level_resolutions(cfg)[:5] == (16, 32, 64, 128, 256)


def test_dense_level_exact_at_nodes(rng):
    """Querying exactly at a dense level's grid nodes returns table entries."""
    cfg = HashGridConfig(
        num_levels=1, log2_hashmap_size=10, base_resolution=5, init_scale=1.0
    )
    key = jax.random.PRNGKey(0)
    tables = hashgrid.init_hash_tables(key, cfg)
    # Node k of a 5-node grid lives at u = k/4 -> x = 2u - 1.
    xs = jnp.linspace(-1.0, 1.0, 5)
    coords = jnp.stack(jnp.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    out = hashgrid.hash_encode(tables, coords, cfg)
    # Dense linear index: ix + 5*iy with coords ordered (dim0=ix? verify both)
    k = np.arange(5)
    iy, ix = np.meshgrid(k, k, indexing="ij")
    expect = np.asarray(tables[0])[iy.ravel() + 5 * ix.ravel()]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_hash_encode_interpolates_midpoints():
    cfg = HashGridConfig(
        num_levels=1, log2_hashmap_size=10, base_resolution=3, init_scale=1.0
    )
    tables = hashgrid.init_hash_tables(jax.random.PRNGKey(1), cfg)
    # Midpoint between node (0,0) and (1,0) along dim0.
    mid = jnp.array([[(-1.0 + 0.0) / 2.0, -1.0]])
    out = hashgrid.hash_encode(tables, mid, cfg)
    t = np.asarray(tables[0])
    expect = 0.5 * (t[0] + t[1])  # idx = c0 + 3*c1
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=1e-6)


def test_hash_encode_gradients_scatter(rng):
    cfg = SMALL
    tables = hashgrid.init_hash_tables(jax.random.PRNGKey(2), cfg)
    coords = jnp.asarray(
        rng.uniform(-1, 1, size=(17, 3)).astype(np.float32)
    )

    def loss(t):
        return jnp.sum(hashgrid.hash_encode(t, coords, cfg) ** 2)

    g = jax.grad(loss)(tables)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_precomputed_plan_matches_direct(rng):
    cfg = SMALL
    tables = hashgrid.init_hash_tables(jax.random.PRNGKey(3), cfg)
    coords = jnp.asarray(rng.uniform(-1, 1, size=(31, 2)).astype(np.float32))
    idx, w = hashgrid.precompute_corners(coords, cfg)
    a = hashgrid.encode_with_plan(tables, idx, w)
    b = hashgrid.hash_encode(tables, coords, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lattice_matches_hash_on_dense_levels():
    """On a lattice, the separable-matmul evaluation must reproduce the hash
    grid's d-linear interpolation exactly for dense (unhashed) levels."""
    hcfg = HashGridConfig(
        num_levels=3, log2_hashmap_size=12, base_resolution=4, init_scale=1.0
    )
    lcfg = LatticeEncodingConfig(
        num_levels=3,
        base_resolution=4,
        dense_entry_budget=1 << 12,
        fine_features=0,
        init_scale=1.0,
    )
    lattice_shape = (9, 7)
    tables = hashgrid.init_hash_tables(jax.random.PRNGKey(4), hcfg)
    # Copy the hash tables into the lattice level grids.
    shapes, _ = lattice.plan_levels(lcfg, lattice_shape)
    levels = []
    for level, shape in enumerate(shapes):
        r = hcfg.level_resolution(level)
        # Lattice caps per-axis resolution at the lattice extent; keep only
        # configs where no capping occurs for exact comparison.
        assert shape == (min(r, 9), min(r, 7))
        if shape != (r, r):
            pytest.skip("capped level; exactness only asserted when uncapped")
        dense = np.zeros((r, r, hcfg.features_per_level), np.float32)
        t = np.asarray(tables[level])
        for i0 in range(r):
            for i1 in range(r):
                dense[i0, i1] = t[i0 + r * i1]
        levels.append(jnp.asarray(dense))
    params = {"levels": tuple(levels), "fine": None}
    plan = lattice.lattice_plan(lcfg, lattice_shape)
    ours = lattice.lattice_encode(params, plan).reshape(-1, 6)

    coords = inr_mod._lattice_coords(lattice_shape)
    theirs = hashgrid.hash_encode(tables, coords, hcfg)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_plan_levels_budget_and_fine_fold():
    cfg = LatticeEncodingConfig()
    shapes, fine = lattice.plan_levels(cfg, (320, 320))
    # 16..256 dense + one per-axis-capped (320, 320) level; the remaining 10
    # super-Nyquist levels fold into 20 per-point fine features.
    assert len(shapes) == 6 and shapes[-1] == (320, 320)
    assert fine == 20


def test_image_inr_shapes():
    cfg = ImageINRConfig(encoding="lattice")
    spec = inr_mod.build_inr(cfg, (12, 10))
    params = spec.init(jax.random.PRNGKey(0))
    out = spec.apply(params, spec.statics)
    assert out.shape == (12, 10, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_motion_inr_shapes_hash():
    cfg = MotionINRConfig(
        encoding="hash",
        grid=SMALL,
        mlp=MLPConfig(hidden_width=16, activation="tanh"),
    )
    spec = inr_mod.build_inr(cfg, (3, 8, 8))
    params = spec.init(jax.random.PRNGKey(1))
    out = spec.apply(params, spec.statics)
    assert out.shape == (3, 8, 8, 2)


def test_inr_trains_toward_target():
    """A tiny INR should fit a smooth target on its lattice (both backends)."""
    import optax

    target = jnp.asarray(
        np.fromfunction(
            lambda i, j: np.sin(i / 3.0) * np.cos(j / 5.0), (16, 16)
        ).astype(np.float32)
    )[..., None].repeat(2, -1)

    for enc in ("hash", "lattice"):
        cfg = ImageINRConfig(
            encoding=enc,
            grid=SMALL,
            lattice=LatticeEncodingConfig(
                num_levels=4, base_resolution=4, dense_entry_budget=1 << 8
            ),
            mlp=MLPConfig(hidden_width=32, activation="relu"),
        )
        spec = inr_mod.build_inr(cfg, (16, 16))
        params = spec.init(jax.random.PRNGKey(2))
        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return jnp.mean((spec.apply(p, spec.statics) - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state2 = opt.update(grads, state)
            return optax.apply_updates(params, updates), state2, loss

        loss0 = None
        for i in range(150):
            params, state, loss = step(params, state)
            if loss0 is None:
                loss0 = float(loss)
        assert float(loss) < 0.1 * loss0, f"{enc}: {loss0} -> {float(loss)}"
