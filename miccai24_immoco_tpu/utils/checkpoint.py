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
    # Overwrite semantics (periodic checkpointing of long runs): write to a
    # sibling tmp dir, then atomically swap — orbax refuses existing dirs.
    tmp = path + ".tmp_save"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    ckpt.save(tmp, tree)
    ckpt.wait_until_finished()
    # Metadata goes into the tmp dir BEFORE the swap so tree+meta become
    # visible atomically — writing it after the swap left a window where a
    # crash produced a restorable tree whose step counter/meta was missing
    # (and a fresh-schedule resume on a partially trained net).
    if metadata is not None:
        with open(os.path.join(tmp, "immoco_meta.json"), "w") as f:
            json.dump(metadata, f)
    # Swap order guarantees a valid checkpoint exists at every instant: move
    # the old one ASIDE (not away) before the tmp takes its place, so a crash
    # mid-swap leaves either path or path+'.old_save' restorable.
    old = path + ".old_save"
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)


def restore(path: str, target: Any = None, host: bool = True) -> Any:
    """Restore a checkpoint; ``target`` (a pytree of arrays or
    ShapeDtypeStructs) pins the result's structure — required when the saved
    tree contains tuples/namedtuples (e.g. optax states), which orbax
    otherwise returns as plain nested containers in storage order.

    ``host=True`` (default) converts the restored leaves to host numpy
    arrays before returning.  TPU-tunnel landmine (round 3, measured): a
    process holding orbax-restored DEVICE buffers fails every subsequent
    large device->host readback with RESOURCE_EXHAUSTED (e.g. the ~40 MB
    corpus pulls in hostio.get_complex), even though the restored tree is
    only ~124 MB on a 16 GB chip; converting to host and dropping the
    device buffers clears it.  Checkpoints are host artifacts — consumers
    jit them back in (one h2d per fit/step, negligible)."""
    import jax
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old_save"):
        # A crash between save()'s two os.replace calls leaves only the
        # set-aside previous checkpoint; restore that.
        path = path + ".old_save"
    def _finish(tree):
        if not host:
            return tree
        import numpy as np

        return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)

    if target is not None:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jax.numpy.shape(x), x.dtype, sharding=sharding
            ),
            target,
        )
        return _finish(ckpt.restore(path, abstract))
    try:
        return _finish(ckpt.restore(path))
    except ValueError:
        # Cross-device restore (e.g. checkpoint saved on CPU, restored on
        # TPU): rebuild an abstract target from the stored metadata so orbax
        # places arrays on the current default device instead of the saved
        # sharding.
        meta = ckpt.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def to_abstract(m):
            return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)

        target = jax.tree.map(to_abstract, tree)
        return _finish(ckpt.restore(path, target))


def restore_with_meta(path: str, target: Any = None) -> Tuple[Any, Dict]:
    path = os.path.abspath(path)
    # Resolve restore()'s crash-recovery fallback ONCE so the metadata is
    # read from the same directory the tree comes from — reading meta from
    # the missing primary path returned {} and silently restarted resumed
    # schedules from step 0.
    if not os.path.exists(path) and os.path.exists(path + ".old_save"):
        path = path + ".old_save"
    tree = restore(path, target=target)
    meta_path = os.path.join(path, "immoco_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
