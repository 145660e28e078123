"""klD-Net detector quality per scenario + DC-projection mask sensitivity.

VERDICT r4 weak #5 / next #7: the DC projection (models/immoco._dc_project,
train_denoiser.denoise_dc) trusts detector-clean columns exactly, so
detector false positives directly tax two shipped paths, yet the committed
dice (0.9996) was measured on the synthetic train regime only.  This script
commits per-scenario precision/recall/dice on the PROTOCOL corpora
(reference gate: src/train/train_kld_net.py:122-126 — dice/IoU val gate)
plus a mask-perturbation sensitivity row for denoise_dc on the hard corpus:
oracle (ground-truth) mask vs detector mask vs dilated/eroded detector mask.

Usage: python scripts/detector_quality.py [n] [out_dir]
  env: DQ_SCENARIOS=light,heavy,hard  DQ_SENS_N=8
Writes <out_dir>/detector_quality.json (+ prints the table).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "artifacts/detector_quality"
    scenarios = os.environ.get("DQ_SCENARIOS", "light,heavy,hard").split(",")
    sens_n = int(os.environ.get("DQ_SENS_N", "8"))

    from miccai24_immoco_tpu import weights
    from miccai24_immoco_tpu.cli import _synthetic_corpus
    from miccai24_immoco_tpu.eval.runners import run_kld

    kld = weights.load_kld(weights.best_kld_name())
    os.makedirs(out_dir, exist_ok=True)
    payload = {"kld": weights.best_kld_name(), "n": n, "scenarios": {}}

    for sc in scenarios:
        corpus = _synthetic_corpus(n, 320, sc, seed=2024)
        rows = run_kld(corpus, kld["net"], kld["params"], limit=n)
        agg = {
            k: {
                "mean": float(np.mean([r[k] for r in rows])),
                "std": float(np.std([r[k] for r in rows])),
            }
            for k in rows[0]
        }
        # False-positive COLUMN rate: fraction of truly-clean columns the
        # detector marks corrupted (these are the columns _dc_project /
        # denoise_dc then replaces with network output instead of measured
        # k-space — the "exactness tax", PERFORMANCE.md round-4-cont.).
        fp_rates = []
        from miccai24_immoco_tpu.train.train_kld import predict_line_mask
        from miccai24_immoco_tpu.utils.hostio import put_complex

        for i in range(n):
            pred = np.asarray(
                predict_line_mask(
                    kld["net"], kld["params"],
                    put_complex(corpus["kspace_motion"][i])[None],
                )[0]
            )
            gt = np.asarray(corpus["mask"][i])
            if gt.ndim == 3:  # (M, H, W) movement masks -> corrupted union
                gt = (gt.sum(0) > 0).astype(np.float32)
            clean = gt.max(axis=0) == 0 if gt.ndim == 2 else gt == 0
            pred_cols = (
                pred.max(axis=0) if pred.ndim == 2 else pred
            ) > 0.5
            n_clean = max(int(clean.sum()), 1)
            fp_rates.append(float((pred_cols & clean).sum()) / n_clean)
        agg["fp_column_rate"] = {
            "mean": float(np.mean(fp_rates)),
            "std": float(np.std(fp_rates)),
        }
        payload["scenarios"][sc] = agg
        print(sc, json.dumps({k: round(v["mean"], 4)
                              for k, v in agg.items()}), flush=True)

    # DC mask sensitivity on hard (denoise_dc with oracle / detector /
    # dilated / eroded masks).
    from miccai24_immoco_tpu.cli import _load_denoiser
    from miccai24_immoco_tpu.train.train_denoiser import denoise_dc
    from miccai24_immoco_tpu.eval.runners import _metrics_dict
    from miccai24_immoco_tpu.utils.hostio import put_complex
    from miccai24_immoco_tpu.train.train_kld import (
        mask_to_line_indicators,
        predict_line_mask,
    )

    den_name = os.environ.get("MC_DENOISER", "denoiser_hard")
    den_net, den_params = _load_denoiser(den_name)
    corpus = _synthetic_corpus(sens_n, 320, "hard", seed=2024)

    # Statics discipline: both param trees as traced args (runners.py:594).
    @jax.jit
    def _dc_forward(ksp, dn_params, kld_params, line):
        return denoise_dc(den_net, dn_params, ksp, line[None])

    @jax.jit
    def _detect(ksp, kld_params):
        pred = predict_line_mask(kld["net"], kld_params, ksp)
        return mask_to_line_indicators(pred[0])

    sens = {}
    for mode in ("detector", "oracle", "dilate1", "erode1"):
        ssims = []
        for i in range(sens_n):
            ksp = put_complex(corpus["kspace_motion"][i])[None]
            if mode == "oracle":
                gt = np.asarray(corpus["mask"][i])
                cols = (gt.sum(0).max(axis=0) > 0) if gt.ndim == 3 \
                    else gt.max(axis=0) > 0
                line = jnp.asarray(cols)
            else:
                line = _detect(ksp, kld["params"])
                if mode == "dilate1":
                    line = line | jnp.roll(line, 1) | jnp.roll(line, -1)
                elif mode == "erode1":
                    line = line & jnp.roll(line, 1) & jnp.roll(line, -1)
            out = _dc_forward(ksp, den_params, kld["params"], line)[0]
            m = _metrics_dict(out, put_complex(corpus["image_rss"][i]))
            ssims.append(m["ssim"])
        sens[mode] = {"ssim_mean": float(np.mean(ssims)), "n": sens_n}
        print("dc_sensitivity", mode, round(sens[mode]["ssim_mean"], 4),
              flush=True)
    payload["dc_mask_sensitivity"] = {"denoiser": den_name, **sens}

    with open(os.path.join(out_dir, "detector_quality.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
