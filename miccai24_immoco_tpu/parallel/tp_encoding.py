"""Level-parallel (tensor-parallel) hash-grid encoding over the tp mesh axis.

The hash grid's levels are independent tables; under tp sharding each device
owns L/tp levels, computes its share of the per-point features, and the full
(N, L*F) encoding materializes via an all-gather over ICI.  Gradients flow
back through the collective (shard_map + all_gather is differentiable), so
each device's table shard receives exactly its local scatter-add — no psum
needed for the tables; replicated MLP parameters see identical gradients on
every device by construction.

This is the template for scaling the encoder beyond one chip's HBM (e.g.
volumetric variants); for the 2-D reference workload it exists to make the
framework's tp axis real and tested (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miccai24_immoco_tpu.config import HashGridConfig
from miccai24_immoco_tpu.ops import hashgrid


def shard_tables(tables: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place (L, T, F) tables with the level axis sharded over tp."""
    return jax.device_put(tables, NamedSharding(mesh, P("tp", None, None)))


def tp_hash_encode(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    cfg: HashGridConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """(L, T, F) sharded tables + (N, d) replicated coords -> (N, L*F).

    Each tp shard hashes/interpolates only its local levels; the feature
    blocks are all-gathered along the level axis.
    """
    tp = mesh.shape["tp"]
    n_levels = cfg.num_levels
    assert n_levels % tp == 0, f"{n_levels} levels not divisible by tp={tp}"

    resolutions = hashgrid.level_resolutions(cfg)

    def local_encode(local_tables, coords):
        # Which level block this shard owns:
        idx = jax.lax.axis_index("tp")
        feats = []
        # Hash level l locally; the level id (and thus resolution) depends on
        # the shard index, which is only known at trace time as a traced
        # value — but resolutions are static per *position within shard*
        # only if we gather over all possibilities. Instead compute every
        # level's (indices, weights) for the local block via lax.switch over
        # the tp shard id.
        local_l = local_tables.shape[0]

        def encode_block(block_start):
            out = []
            for j in range(local_l):
                res = resolutions[block_start + j]
                pos = jnp.clip((coords + 1.0) * 0.5, 0.0, 1.0) * (res - 1)
                base = jnp.floor(pos)
                t = pos - base
                offsets = jnp.asarray(hashgrid._corner_offsets(coords.shape[-1]))
                corners = base[:, None, :].astype(jnp.int32) + offsets[None]
                corners = jnp.clip(corners, 0, res - 1)
                lidx = hashgrid._level_indices(corners, res, cfg)
                w = jnp.prod(
                    jnp.where(
                        offsets[None].astype(bool),
                        t[:, None, :],
                        1.0 - t[:, None, :],
                    ),
                    axis=-1,
                )
                vals = jnp.take(local_tables[j], lidx.reshape(-1), axis=0)
                vals = vals.reshape(*lidx.shape, -1)
                out.append(jnp.sum(vals * w[..., None], axis=1))
            return jnp.concatenate(out, axis=-1)  # (N, local_l * F)

        branches = [
            partial(encode_block, b * local_l) for b in range(tp)
        ]
        local_feats = jax.lax.switch(idx, branches)
        # (N, local_l*F) per shard -> (N, L*F) everywhere.
        return jax.lax.all_gather(local_feats, "tp", axis=1, tiled=True)

    return jax.jit(
        jax.shard_map(
            local_encode,
            mesh=mesh,
            in_specs=(P("tp", None, None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(tables, coords)
