"""Merge per-scenario e2e report dirs into one artifact dir.

Round-3 ran each scenario with its tuned config via E2E_OUT=<dir> and the
artifact was assembled by hand; this makes the assembly reproducible.

Usage:
  python scripts/merge_e2e_reports.py OUT scenario=dir [scenario=dir ...]

Each input dir is a scripts/e2e_eval.py E2E_OUT directory (immoco.json,
corrupted_baseline.json, meta.json, per-scenario .tex/.png).  JSON reports
are merged scenario-keyed; .tex/.png/diag files are copied through.
"""

import json
import os
import shutil
import sys


def main():
    out = sys.argv[1]
    pairs = [a.split("=", 1) for a in sys.argv[2:]]
    os.makedirs(out, exist_ok=True)

    merged = {"immoco": {}, "corrupted_baseline": {}}
    meta = {"scenarios": {}}
    for scenario, d in pairs:
        for name in ("immoco", "corrupted_baseline"):
            with open(os.path.join(d, f"{name}.json")) as f:
                rep = json.load(f)
            if scenario not in rep:
                raise SystemExit(f"{d}/{name}.json has no '{scenario}' key")
            merged[name][scenario] = rep[scenario]
        mpath = os.path.join(d, "meta.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            meta["scenarios"][scenario] = m["scenarios"].get(scenario, m)
        for fn in os.listdir(d):
            if fn.endswith((".tex", ".png")) or fn.startswith("diags_"):
                # Prefix with the scenario (round-3 artifact convention) so
                # same-named files from different scenario dirs don't clash.
                dst = fn if fn.startswith((scenario, "diags_")) else (
                    f"{scenario}_{fn}"
                )
                shutil.copy2(os.path.join(d, fn), os.path.join(out, dst))

    for name, rep in merged.items():
        with open(os.path.join(out, f"{name}.json"), "w") as f:
            json.dump(rep, f, indent=2)
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("merged", [s for s, _ in pairs], "->", out)


if __name__ == "__main__":
    main()
