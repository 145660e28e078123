"""Offline margin sweep for the learned no-reference do-no-harm selector.

VERDICT r4 next #4: wire the converged AF+ metric net as fallback_scorer
and close the heavy clean-GT tail (<= 5 regressing slices) without
sacrificing aggregates.  One heavy e2e run with E2E_SCORER and margin=1e9
(never triggers) records score_corrected / score_corrupted per slice in
diags_heavy.json; this script then evaluates EVERY margin offline — a
slice whose score_corrected > score_corrupted + margin reports the
corrupted metrics instead of the fit's (exactly runners.run_immoco_batched
fallback semantics, runners.py:455-470) — and prints, per margin:
clean-GT-PSNR-regressing slice count, #fallbacks, and aggregate deltas.

Usage: python scripts/scorer_margin_sweep.py [dir=results/heavy_scorer_r5]
"""

import json
import os
import sys

import numpy as np


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "results/heavy_scorer_r5"
    fit = json.load(open(os.path.join(d, "immoco.json")))
    base = json.load(open(os.path.join(d, "corrupted_baseline.json")))
    diags = json.load(open(os.path.join(d, "diags_heavy.json")))
    scen = "heavy" if "heavy" in fit else list(fit)[0]
    fit_rows = fit[scen]["per_slice"]
    base_rows = base[scen]["per_slice"]
    n = len(fit_rows)
    dscore = np.array(
        [diags[i]["score_corrected"] - diags[i]["score_corrupted"]
         for i in range(n)]
    )

    def report(margin):
        sel = [
            base_rows[i] if dscore[i] > margin else fit_rows[i]
            for i in range(n)
        ]
        regress = sum(
            1 for i in range(n)
            if sel[i].get("psnr_clean", sel[i]["psnr"])
            < base_rows[i].get("psnr_clean", base_rows[i]["psnr"]) - 1e-9
        )
        agg = {k: float(np.mean([r[k] for r in sel]))
               for k in ("ssim", "psnr", "haar_psi")}
        aggc = {k: float(np.mean([r.get(f"{k}_clean", r[k]) for r in sel]))
                for k in ("ssim", "psnr")}
        nfb = int((dscore > margin).sum())
        return regress, nfb, agg, aggc

    base_regress, _, agg0, aggc0 = report(float("inf"))
    print(f"no-selector: clean-PSNR regressions {base_regress}/{n}, "
          f"agg {json.dumps({k: round(v, 4) for k, v in agg0.items()})} "
          f"clean {json.dumps({k: round(v, 4) for k, v in aggc0.items()})}")
    rows = []
    for m in (np.quantile(dscore, q) for q in
              (0.5, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 0.98)):
        r, nfb, agg, aggc = report(float(m))
        rows.append({"margin": float(m), "fallbacks": nfb,
                     "clean_psnr_regressions": r,
                     "agg": agg, "agg_clean": aggc})
        print(f"margin {m:+.4g}: fallbacks {nfb:2d}, regressions {r}/{n}, "
              f"ssim {agg['ssim']:.4f} psnr {agg['psnr']:.2f} "
              f"clean_psnr {aggc['psnr']:.2f}")
    with open(os.path.join(d, "margin_sweep.json"), "w") as f:
        json.dump({"no_selector_regressions": base_regress, "rows": rows},
                  f, indent=2)
    print("wrote", os.path.join(d, "margin_sweep.json"))


if __name__ == "__main__":
    main()
