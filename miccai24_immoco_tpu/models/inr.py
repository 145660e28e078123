"""INR modules: encoding backbone + small MLP head, as pure pytree functions.

The reference wraps tiny-cuda-nn's ``NetworkWithInputEncoding`` (CUDA) for
both INRs (immoco.py:60-65).  Here an INR is a plain parameter pytree plus a
pure apply function, which composes cleanly with ``lax.scan`` (200-step inner
fit), ``vmap`` (slice batching) and ``shard_map`` (device parallelism).

Two encoding backends (selected by config):

- ``hash``    — faithful multiresolution hash grid (ops/hashgrid.py) with the
                gather plan precomputed once per lattice, so the scan body is
                pure gather + lerp + matmul.
- ``lattice`` — separable dense-pyramid encoding (ops/lattice.py), zero
                gathers, MXU matmuls only.

MLP head mirrors the reference configs (immoco.py:11-25): 1 hidden layer,
256-wide ReLU for the Image INR, 64-wide Tanh for the Motion INR, linear
2-feature output.  Optionally computes in bfloat16 (fp32 params/accums).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import MLPConfig
from miccai24_immoco_tpu.ops import hashgrid, lattice


def init_mlp(key, in_dim: int, cfg: MLPConfig) -> Dict[str, Any]:
    widths = [in_dim] + [cfg.hidden_width] * cfg.num_hidden_layers + [cfg.out_features]
    layers = []
    for i, (d_in, d_out) in enumerate(zip(widths[:-1], widths[1:])):
        key, sub = jax.random.split(key)
        if cfg.activation == "relu":
            scale = jnp.sqrt(2.0 / d_in)  # He
        else:
            scale = jnp.sqrt(1.0 / d_in)  # LeCun / tanh-friendly
        w = scale * jax.random.normal(sub, (d_in, d_out), dtype=jnp.float32)
        b = jnp.zeros((d_out,), dtype=jnp.float32)
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def apply_mlp(params, x: jnp.ndarray, cfg: MLPConfig, compute_dtype=jnp.float32):
    """x: (..., in_dim) -> (..., out_features). Matmuls in compute_dtype with
    fp32 accumulation (MXU-friendly when compute_dtype=bfloat16)."""
    act = jax.nn.relu if cfg.activation == "relu" else jnp.tanh
    h = x.astype(compute_dtype)
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        h = (
            jnp.dot(
                h,
                layer["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + layer["b"]
        )
        if i < n_layers - 1:
            h = act(h).astype(compute_dtype)
    return h.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class INRSpec:
    """A compiled-shape INR bound to a fixed query lattice.

    ``init(key)`` builds parameters; ``apply(params)`` evaluates the INR at
    every lattice point, returning (*lattice_shape, out_features) fp32.
    """

    init: Callable[[Any], Dict[str, Any]]
    apply: Callable[[Dict[str, Any]], jnp.ndarray]
    feature_width: int
    lattice_shape: Tuple[int, ...]


def _lattice_coords(lattice_shape: Sequence[int]) -> jnp.ndarray:
    """(N, d) meshgrid coordinates in [-1, 1], 'ij' indexing — identical to
    the reference's make_grids (immoco.py:48-53) and, for 2-D, to the
    identity affine grid with align_corners=True up to the (x, y) vs
    (row, col) axis order handled by callers."""
    axes = [jnp.linspace(-1.0, 1.0, s, dtype=jnp.float32) for s in lattice_shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1).reshape(-1, len(lattice_shape))


def build_inr(inr_cfg, lattice_shape, compute_dtype=jnp.float32) -> INRSpec:
    """Construct an INR spec from an ImageINRConfig / MotionINRConfig."""
    lattice_shape = tuple(int(s) for s in lattice_shape)
    mlp_cfg: MLPConfig = inr_cfg.mlp

    if inr_cfg.encoding == "hash":
        coords = _lattice_coords(lattice_shape)
        width = inr_cfg.grid.num_features
        dims = len(lattice_shape)
        # Precomputing the gather plan trades memory for removing all hashing
        # from the scan body. For huge 3-D lattices (movements * H * W points
        # x 16 levels x 8 corners) the plan would be GBs, so fall back to
        # on-the-fly hashing there (XLA still fuses it into the step graph).
        plan_entries = coords.shape[0] * inr_cfg.grid.num_levels * (2**dims)
        use_plan = plan_entries <= 64_000_000
        if use_plan:
            indices, weights = hashgrid.precompute_corners(coords, inr_cfg.grid)

        def init(key):
            k_enc, k_mlp = jax.random.split(key)
            return {
                "enc": hashgrid.init_hash_tables(k_enc, inr_cfg.grid),
                "mlp": init_mlp(k_mlp, width, mlp_cfg),
            }

        def apply(params):
            if use_plan:
                feats = hashgrid.encode_with_plan(params["enc"], indices, weights)
            else:
                feats = hashgrid.hash_encode(params["enc"], coords, inr_cfg.grid)
            out = apply_mlp(params["mlp"], feats, mlp_cfg, compute_dtype)
            return out.reshape(*lattice_shape, mlp_cfg.out_features)

    elif inr_cfg.encoding == "lattice":
        plan = lattice.lattice_plan(inr_cfg.lattice, lattice_shape)
        width = lattice.feature_width(inr_cfg.lattice, lattice_shape)

        def init(key):
            k_enc, k_mlp = jax.random.split(key)
            return {
                "enc": lattice.init_lattice_params(
                    k_enc, inr_cfg.lattice, lattice_shape
                ),
                "mlp": init_mlp(k_mlp, width, mlp_cfg),
            }

        def apply(params):
            feats = lattice.lattice_encode(params["enc"], plan)
            return apply_mlp(params["mlp"], feats, mlp_cfg, compute_dtype)

    else:
        raise ValueError(f"unknown encoding: {inr_cfg.encoding!r}")

    return INRSpec(
        init=init, apply=apply, feature_width=width, lattice_shape=lattice_shape
    )
