"""Named checkpoint registry.

The reference distributes five pre-trained torch checkpoints via wget from a
university cloud (src/model_weights/download_weights.py:10-33).  This
framework keeps versioned orbax checkpoints in-repo (or any mounted path)
under symbolic names; ``load(name)`` returns (params, metadata).

Registered artifacts shipped with the repo:

- ``kld_synthetic``: klD-Net line detector trained on synthetic phantoms
  (320^2, on-the-fly motion simulation) — a functional stand-in until a
  fastMRI-trained detector is produced with the same recipe.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGISTRY: Dict[str, str] = {
    "kld_synthetic": os.path.join(_ROOT, "artifacts", "kld_synthetic"),
}


def path_of(name: str) -> str:
    if name in REGISTRY:
        return REGISTRY[name]
    if os.path.exists(name):
        return name
    raise KeyError(
        f"unknown weights {name!r}; registered: {sorted(REGISTRY)}"
    )


def available(name: str) -> bool:
    try:
        return os.path.exists(path_of(name))
    except KeyError:
        return False


def load(name: str) -> Tuple[dict, dict]:
    """-> (params pytree, metadata dict)."""
    return restore_with_meta(path_of(name))


def load_kld(name: str = "kld_synthetic"):
    """-> {"net": Unet, "params": ...} ready for eval/runners."""
    from miccai24_immoco_tpu.models.unet import build_kld_net

    params, meta = load(name)
    return {"net": build_kld_net(), "params": params, "meta": meta}
