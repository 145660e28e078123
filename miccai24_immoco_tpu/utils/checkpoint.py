"""Checkpoint save/restore (orbax-backed).

The reference only ever saves best-metric state_dicts and has no resume
support (SURVEY.md §5).  Here checkpoints are orbax pytrees with metadata,
restorable into training loops (save -> resume round-trips are tested).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple


def save(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree)
    ckpt.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "immoco_meta.json"), "w") as f:
            json.dump(metadata, f)


def restore(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path))


def restore_with_meta(path: str) -> Tuple[Any, Dict]:
    tree = restore(path)
    meta_path = os.path.join(os.path.abspath(path), "immoco_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
