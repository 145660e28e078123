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

Statics discipline (important for TPU compile times): everything that is
fixed per (lattice, config) — gather plans, interpolation matrices, raw
coordinates — is materialized eagerly ONCE into ``INRSpec.statics`` and must
be threaded through jitted callers as an *argument*.  Closing over these
arrays would embed them as giant constants that XLA then constant-folds at
every compile (minutes of compile time for the 3-D motion lattice).

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


def apply_mlp_cf(params, x: jnp.ndarray, cfg: MLPConfig, compute_dtype=jnp.float32):
    """Channel-FIRST MLP: x (in_dim, ...) -> (out_features, ...).

    Every layer contracts the leading feature axis (dot_general), so all
    full-lattice intermediates keep wide spatial trailing dims — on TPU the
    channel-last variant's narrow trailing dims (2/8 features vs the 128-wide
    lane tile) lane-pad every elementwise op and relayout up to 64x.
    Same math as apply_mlp (transposed weights feed the same matmuls).
    """
    act = jax.nn.relu if cfg.activation == "relu" else jnp.tanh
    h = x.astype(compute_dtype)
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        w = layer["w"].astype(compute_dtype)  # (d_in, d_out)
        # (d_out, ...) = contract d_in of w against leading axis of h.
        h = jax.lax.dot_general(
            w,
            h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + layer["b"].reshape((-1,) + (1,) * (h.ndim - 1))
        if i < n_layers - 1:
            h = act(h).astype(compute_dtype)
    return h.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class INRSpec:
    """A compiled-shape INR bound to a fixed query lattice.

    - ``statics``: pytree of device arrays (gather plans / interp matrices /
      coordinates).  PASS AS A JIT ARGUMENT; never close over it.
    - ``init(key)`` builds parameters.
    - ``apply(params, statics)`` evaluates the INR at every lattice point,
      returning (*lattice_shape, out_features) fp32.
    """

    init: Callable[[Any], Dict[str, Any]]
    apply: Callable[[Dict[str, Any], Any], jnp.ndarray]
    statics: Any
    feature_width: int
    lattice_shape: Tuple[int, ...]
    # Channel-first evaluation: (params, statics) -> (out_features,
    # *lattice_shape).  Present for the lattice encoding (the TPU hot path);
    # None for encodings without a cf implementation.
    apply_cf: Any = None


def _lattice_coords(lattice_shape: Sequence[int]) -> jnp.ndarray:
    """(N, d) meshgrid coordinates in [-1, 1], 'ij' indexing — identical to
    the reference's make_grids (immoco.py:48-53)."""
    axes = [jnp.linspace(-1.0, 1.0, s, dtype=jnp.float32) for s in lattice_shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1).reshape(-1, len(lattice_shape))


# Gather-plan budget: above this many (point x level x corner) entries the
# plan arrays would dominate HBM, so hashing happens on the fly instead.
_PLAN_ENTRY_BUDGET = 64_000_000


def build_inr(
    inr_cfg, lattice_shape, compute_dtype=jnp.float32, param_shape=None
) -> INRSpec:
    """Construct an INR spec from an ImageINRConfig / MotionINRConfig.

    ``param_shape``: build the PARAMETERS for this (full-resolution) query
    lattice while evaluating on ``lattice_shape`` — cross-resolution
    evaluation for the coarse-to-fine fit (models/immoco.py).  ``init`` then
    returns trees bit-compatible with a ``param_shape``-raster model's, so
    params/optimizer state transfer across rasters.  Hash encodings are
    raster-independent by construction (tables + on-the-fly corners), so the
    argument only affects the lattice encoding's level/fine grids.
    """
    lattice_shape = tuple(int(s) for s in lattice_shape)
    if param_shape is not None:
        param_shape = tuple(int(s) for s in param_shape)
        if param_shape == lattice_shape:
            param_shape = None
    mlp_cfg: MLPConfig = inr_cfg.mlp
    apply_cf = None

    if inr_cfg.encoding == "hash":
        dims = len(lattice_shape)
        n_points = 1
        for s in lattice_shape:
            n_points *= s
        plan_entries = n_points * inr_cfg.grid.num_levels * (2**dims)
        use_plan = plan_entries <= _PLAN_ENTRY_BUDGET
        width = inr_cfg.grid.num_features

        coords = jax.jit(_lattice_coords, static_argnums=0)(lattice_shape)
        if use_plan:
            indices, weights = jax.jit(
                hashgrid.precompute_corners, static_argnums=1
            )(coords, inr_cfg.grid)
            statics = {"indices": indices, "weights": weights}
        else:
            statics = {"coords": coords}

        def init(key):
            k_enc, k_mlp = jax.random.split(key)
            return {
                "enc": hashgrid.init_hash_tables(k_enc, inr_cfg.grid),
                "mlp": init_mlp(k_mlp, width, mlp_cfg),
            }

        def apply(params, statics):
            if use_plan:
                feats = hashgrid.encode_with_plan(
                    params["enc"], statics["indices"], statics["weights"]
                )
            else:
                feats = hashgrid.hash_encode(
                    params["enc"], statics["coords"], inr_cfg.grid
                )
            out = apply_mlp(params["mlp"], feats, mlp_cfg, compute_dtype)
            return out.reshape(*lattice_shape, mlp_cfg.out_features)

    elif inr_cfg.encoding == "lattice":
        p_shape = param_shape or lattice_shape
        plan = lattice.lattice_plan(inr_cfg.lattice, lattice_shape, param_shape)
        plan_cf = lattice.lattice_plan_cf(
            inr_cfg.lattice, lattice_shape, param_shape
        )
        width = lattice.feature_width(inr_cfg.lattice, p_shape)
        statics = {"plan": plan, "plan_cf": plan_cf}

        def init(key):
            k_enc, k_mlp = jax.random.split(key)
            return {
                "enc": lattice.init_lattice_params(
                    k_enc, inr_cfg.lattice, p_shape
                ),
                "mlp": init_mlp(k_mlp, width, mlp_cfg),
            }

        def apply(params, statics):
            feats = lattice.lattice_encode(params["enc"], statics["plan"])
            return apply_mlp(params["mlp"], feats, mlp_cfg, compute_dtype)

        def _apply_cf(params, statics):
            feats = lattice.lattice_encode_cf(
                params["enc"], statics["plan_cf"]
            )
            return apply_mlp_cf(params["mlp"], feats, mlp_cfg, compute_dtype)

        apply_cf = _apply_cf

    else:
        raise ValueError(f"unknown encoding: {inr_cfg.encoding!r}")

    return INRSpec(
        init=init,
        apply=apply,
        statics=statics,
        feature_width=width,
        lattice_shape=lattice_shape,
        apply_cf=apply_cf,
    )
