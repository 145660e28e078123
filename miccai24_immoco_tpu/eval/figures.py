"""Paper-style comparison figures.

Replaces the reference's paper_visualizations.ipynb (SURVEY.md C25): an
N-method comparison panel on a chosen sample with SSIM/PSNR insets and
error maps against ground truth.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter


def method_comparison_figure(
    gt: np.ndarray,
    methods: Dict[str, np.ndarray],
    out_path: str,
    with_error_maps: bool = True,
    title: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    """Renders |image| panels for each method with SSIM/PSNR insets and
    (optionally) a row of |error| maps; returns the computed metrics."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax

    gt_mag = np.abs(gt)

    # One jitted graph for all panels: eager slices/metrics on the
    # tunneled TPU both pay a ~30 s remote compile PER OP and can hit
    # UNIMPLEMENTED layouts (CLAUDE.md landmine #4; observed in the
    # round-3 method-comparison run on center_crop_quarter's slice).
    @jax.jit
    def _score(mag, g):
        m = calmetric2d(
            center_crop_quarter(mag)[None, None],
            center_crop_quarter(g)[None, None],
        )
        return jnp.stack([m.ssim, m.psnr])

    scores = {}
    for name, img in methods.items():
        # Magnitude taken on HOST: method images arrive as host complex64
        # and complex must never cross host->device (CLAUDE.md landmine #1
        # — the jnp.asarray(complex) transfer is UNIMPLEMENTED on the
        # tunneled TPU).
        mag = np.abs(np.asarray(img)).astype(np.float32)
        s = np.asarray(_score(jnp.asarray(mag), jnp.asarray(gt_mag)))
        scores[name] = {"ssim": float(s[0]), "psnr": float(s[1])}

    n = len(methods) + 1
    rows = 2 if with_error_maps else 1
    fig, axs = plt.subplots(rows, n, figsize=(4 * n, 4 * rows), squeeze=False)

    axs[0][0].imshow(gt_mag, cmap="gray")
    axs[0][0].set_title("Ground truth")
    axs[0][0].set_axis_off()
    if with_error_maps:
        axs[1][0].set_axis_off()

    vmax_err = max(
        np.abs(np.abs(np.asarray(img)) - gt_mag).max()
        for img in methods.values()
    )
    for i, (name, img) in enumerate(methods.items(), start=1):
        mag = np.abs(np.asarray(img))
        axs[0][i].imshow(mag, cmap="gray")
        s = scores[name]
        axs[0][i].set_title(name)
        axs[0][i].text(
            0.02,
            0.02,
            f"SSIM {s['ssim']:.3f}\nPSNR {s['psnr']:.1f}",
            color="yellow",
            fontsize=10,
            transform=axs[0][i].transAxes,
            va="bottom",
        )
        axs[0][i].set_axis_off()
        if with_error_maps:
            axs[1][i].imshow(
                np.abs(mag - gt_mag), cmap="inferno", vmin=0, vmax=vmax_err
            )
            axs[1][i].set_title(f"|error| {name}", fontsize=9)
            axs[1][i].set_axis_off()

    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return scores
