"""Evaluation harness: per-scenario metric runs, aggregation, LaTeX tables,
violin plots, comparison figures.

Replaces the copy-pasted per-script eval pattern of the reference
(SURVEY.md C22: src/test/test_*.py all repeat load -> loop 50 slices x
{light, heavy} -> quarter-crop metrics -> metrics.pth + LaTeX + PNG) with
one reusable module.  Protocol parity:

- metrics on min-max-normalized magnitudes of H/4-center-cropped images
  (test_immoco.py:77-94, evaluate.py:57-80)
- mean +- std LaTeX table per scenario (test_immoco.py:136-169 layout)
- seaborn violin plot per metric (evaluate.py:166-191)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter

METRIC_NAMES = ("ssim", "psnr", "haar_psi", "rmse")


@jax.jit
def _slice_metrics(pred_mag: jnp.ndarray, gt_mag: jnp.ndarray) -> jnp.ndarray:
    m = calmetric2d(
        center_crop_quarter(pred_mag)[None, None],
        center_crop_quarter(gt_mag)[None, None],
    )
    return jnp.stack([m.ssim, m.psnr, m.haarpsi, m.rmse])


def evaluate_slices(
    preds: Sequence[jnp.ndarray], gts: Sequence[jnp.ndarray]
) -> List[Dict[str, float]]:
    """Per-slice quarter-crop metrics on magnitude images."""
    out = []
    for p, g in zip(preds, gts):
        vals = np.asarray(_slice_metrics(jnp.abs(p), jnp.abs(g)))
        out.append({k: float(v) for k, v in zip(METRIC_NAMES, vals)})
    return out


def aggregate(metrics: Sequence[Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    # Aggregate every key the per-slice dicts carry (METRIC_NAMES plus any
    # supplementary columns, e.g. the *_clean noise-free-GT variants the
    # synthetic protocol adds); LaTeX/violin outputs stay METRIC_NAMES-only.
    keys = list(metrics[0].keys()) if metrics else list(METRIC_NAMES)
    return {
        k: {
            "mean": float(np.mean([m[k] for m in metrics])),
            "std": float(np.std([m[k] for m in metrics], ddof=1))
            if len(metrics) > 1
            else 0.0,
        }
        for k in keys
    }


def latex_table(
    per_scenario: Dict[str, Sequence[Dict[str, float]]],
    caption: str,
    label: str,
) -> str:
    """Scenario-rows x metric-columns mean+-std table (test_immoco.py:136-169
    layout, column order SSIM / PSNR / HaarPSI / RMSE)."""
    lines = [
        "\\begin{table}[h]",
        "\\centering",
        f"\\caption{{{caption}}}",
        f"\\label{{tab:{label}}}",
        "\\begin{tabular}{l|cccc}",
        "\\toprule",
        "Scenario & SSIM & PSNR & HaarPSI & RMSE \\\\",
        "\\midrule",
    ]
    for scenario, ms in per_scenario.items():
        agg = aggregate(ms)
        cells = " & ".join(
            f"{agg[k]['mean']:.2f}$\\pm${agg[k]['std']:.2f}" for k in METRIC_NAMES
        )
        lines.append(f"{scenario} & {cells} \\\\")
    lines += ["\\bottomrule", "\\end{tabular}", "\\end{table}"]
    return "\n".join(lines)


def save_report(
    per_scenario: Dict[str, Sequence[Dict[str, float]]],
    out_dir: str,
    name: str,
    extra: Optional[Dict] = None,
) -> None:
    """Writes <name>.json (machine-readable), <name>.tex, and violin PNGs.

    ``extra``: additional top-level json fields (e.g. wall-clock records).
    """
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        s: {"per_slice": list(ms), "aggregate": aggregate(ms)}
        for s, ms in per_scenario.items()
    }
    if extra:
        payload.update(extra)
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=2)
    with open(os.path.join(out_dir, f"{name}.tex"), "w") as f:
        f.write(latex_table(per_scenario, f"{name} metrics", name))
    try:
        violin_plot(per_scenario, out_dir, name)
    except Exception:  # plotting backends are optional at runtime
        pass


def violin_plot(per_scenario, out_dir: str, name: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    for metric in METRIC_NAMES:
        df = pd.DataFrame(
            {s: [m[metric] for m in ms] for s, ms in per_scenario.items()}
        )
        sns.set_style("darkgrid")
        sns.set_palette(sns.color_palette("colorblind", max(len(df.columns), 2)))
        fig, ax = plt.subplots()
        sns.violinplot(data=df, ax=ax)
        ax.set_title(metric.upper())
        ax.set_ylabel(metric.upper())
        ax.set_xlabel("Scenario")
        fig.savefig(os.path.join(out_dir, f"{name}_{metric}_violin.png"))
        plt.close(fig)


def comparison_figure(
    images: Dict[str, np.ndarray], out_path: str, title: Optional[str] = None
) -> None:
    """N-panel grayscale comparison (the 3-panel pattern of
    test_immoco.py:96-105, generalized)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    fig, axs = plt.subplots(1, n, figsize=(6 * n, 5))
    if n == 1:
        axs = [axs]
    for ax, (name, img) in zip(axs, images.items()):
        ax.imshow(np.abs(img), cmap="gray")
        ax.set_title(name, fontsize=16)
        ax.set_axis_off()
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
