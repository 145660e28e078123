"""Denoiser-only row on a frozen synthetic corpus (default: hard, seed 2024).

Re-scores just the U-Net denoiser at protocol scale (quarter-crop metrics,
eval/harness.aggregate) so a fine-tune iteration does not need the full
five-method comparison rerun (scripts/method_comparison.py).

Usage: python scripts/eval_denoiser_hard.py [ckpt=denoiser_hard] [n=50]
       [scenario=hard] [mode=plain|dc]
``dc`` = detector-driven data-consistency projection
(train_denoiser.denoise_dc, best registered klD-Net).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "denoiser_hard"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    scenario = sys.argv[3] if len(sys.argv) > 3 else "hard"
    mode = sys.argv[4] if len(sys.argv) > 4 else "plain"
    if mode not in ("plain", "dc"):
        raise SystemExit(f"mode must be 'plain' or 'dc', got {mode!r}")

    from miccai24_immoco_tpu import weights
    from miccai24_immoco_tpu.cli import _load_denoiser, _synthetic_corpus
    from miccai24_immoco_tpu.eval.harness import aggregate
    from miccai24_immoco_tpu.eval.runners import run_denoiser

    net, params = _load_denoiser(ckpt)
    kld = weights.load_kld(weights.best_kld_name()) if mode == "dc" else None
    corpus = _synthetic_corpus(n, 320, scenario, seed=2024)
    rows = run_denoiser(corpus, net, params, limit=n, kld=kld)
    agg = aggregate(rows)
    print(json.dumps({"ckpt": ckpt, "scenario": scenario, "n": n,
                      "mode": mode, "aggregate": agg}))
    save_to = os.environ.get("EDH_SAVE")
    if save_to:
        with open(save_to, "w") as f:
            json.dump({"ckpt": ckpt, "scenario": scenario, "n": n,
                       "mode": mode, "aggregate": agg, "per_slice": rows}, f)


if __name__ == "__main__":
    main()
