"""Device-mesh construction helpers.

The natural scaling axis for IM-MoCo is data-parallel *slice batching*
(SURVEY.md §2.4): instance fits are embarrassingly parallel, and per-slice
INR/optimizer state is tiny relative to HBM.  A second ``tp`` axis shards
the hash-table / fine-feature parameters for level-parallel encoding —
useful when fitting very large batches where even small per-slice state
adds up, and as the template for any future larger-encoder variant.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miccai24_immoco_tpu.config import MeshConfig


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.tp)
    if n % tp:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    dp = cfg.dp if cfg.dp > 0 else n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def dp_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis sharding over dp; remaining axes replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
