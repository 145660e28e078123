"""Movement-group mask algebra.

The reference extracts contiguous runs of predicted motion-corrupted k-space
columns into numbered movement groups with a Python loop over 320 columns
(src/utils/motion_utils.py:56-109).  Here the run-length labeling is a
vectorized cumulative sum, jit/vmap-safe, and the group-mask stack comes out
zero-padded to a static ``max_groups`` — the shape contract the XLA instance
fit needs (padding with all-zero masks is forward-model-invariant because the
masked FFT terms multiply by zero and the DC term uses 1 - sum(masks)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def group_labels(line_indicators: jnp.ndarray) -> jnp.ndarray:
    """Label contiguous runs of 1s with 1-based group ids.

    Args:
      line_indicators: (W,) bool/int — 1 where a phase-encode column is
        motion-corrupted.

    Returns:
      (W,) int32 — 0 for clean columns, k for columns of the k-th run
      (left to right), exactly matching the reference's loop semantics.
    """
    ind = line_indicators.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), ind[:-1]])
    starts = ind * (1 - prev)
    run_id = jnp.cumsum(starts)
    return run_id * ind


def group_label_image(line_indicators: jnp.ndarray) -> jnp.ndarray:
    """(W,) indicators -> (W, W) image of column group labels, the
    make_list=False output of the reference (motion_utils.py:69-91)."""
    labels = group_labels(line_indicators)
    w = labels.shape[0]
    return jnp.broadcast_to(labels[None, :], (w, w))


def extract_movement_groups(
    line_indicators: jnp.ndarray,
    height: int,
    max_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack of binary per-group column masks, statically padded.

    Args:
      line_indicators: (W,) bool/int corrupted-column indicators.
      height: H of the k-space (masks broadcast over rows).
      max_groups: static pad size for the group axis.

    Returns:
      masks: (max_groups, H, W) float32 — masks[g, :, w] = 1 iff column w
        belongs to run g+1; all-zero planes beyond the actual run count.
      n_groups: () int32 — the actual number of runs.
    """
    labels = group_labels(line_indicators)  # (W,)
    w = labels.shape[0]
    gids = jnp.arange(1, max_groups + 1, dtype=jnp.int32)
    cols = (labels[None, :] == gids[:, None]).astype(jnp.float32)  # (G, W)
    masks = jnp.broadcast_to(cols[:, None, :], (max_groups, height, w))
    return masks, labels.max().astype(jnp.int32)
