#!/bin/bash
# Round-4 protocol artifacts: the timed bench configs ARE the validated
# configs (VERDICT r3 weak #3 / next #4), plus the reference-regime "hard"
# scenario (next #2).  Run on the TPU with a warm .jax_cache; each step is
# independently resumable.  Usage: bash scripts/run_round4_artifacts.sh [step]
set -e
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
STEP="${1:-all}"

# --- 1. light e2e at the EXACT bench default (115 it, c2f 12@192+24@256,
#        freeze 25, motres 4, bucket 8) ---------------------------------
if [ "$STEP" = all ] || [ "$STEP" = light ]; then
  E2E_ITERS=115 E2E_C2F=12@192+24@256 E2E_FREEZE=25 E2E_MOTRES=4 \
  E2E_BUCKETS=8 E2E_OUT=results/e2e_r4_light \
  timeout 5400 $PY scripts/e2e_eval.py 50 light
fi

# --- 2. heavy e2e at the EXACT heavy recipe (150 it, c2f 38@256,
#        freeze 34, duty 10x10, bucket 18).  NO restarts: best-of-3 with
#        select=loss was MEASURED net-harmful here (round 4: 18 vs 13
#        clean-psnr-regressing slices, mean psnr -0.75 dB vs the plain
#        protocol - the final-loss criterion favors seeds that overfit
#        the corrupted data) ------------------------------------------
if [ "$STEP" = all ] || [ "$STEP" = heavy ]; then
  E2E_ITERS=150 E2E_C2F=38@256 E2E_FREEZE=34 E2E_DUTY=10x10 E2E_MOTRES=4 \
  E2E_BUCKETS=18 E2E_DIAG=1 \
  E2E_OUT=results/e2e_r4_heavy \
  timeout 10800 $PY scripts/e2e_eval.py 50 heavy
fi

# --- 3. hard e2e (reference-regime severity: heavy sim on the textured
#        noise-free phantom — corrupted SSIM ~0.80; the heavy recipe
#        applies unchanged) --------------------------------------------
if [ "$STEP" = all ] || [ "$STEP" = hard ]; then
  E2E_ITERS=150 E2E_C2F=38@256 E2E_FREEZE=34 E2E_DUTY=10x10 E2E_MOTRES=4 \
  E2E_BUCKETS=18 E2E_DIAG=1 \
  E2E_OUT=results/e2e_r4_hard \
  timeout 10800 $PY scripts/e2e_eval.py 50 hard
fi

# --- 4. merge the per-scenario reports into the round-4 artifact -------
if [ "$STEP" = all ] || [ "$STEP" = merge ]; then
  $PY scripts/merge_e2e_reports.py \
    artifacts/e2e_round4_50slice \
    light=results/e2e_r4_light heavy=results/e2e_r4_heavy \
    hard=results/e2e_r4_hard
fi

# --- 5. five-method comparison on the hard corpus ----------------------
if [ "$STEP" = all ] || [ "$STEP" = mc_hard ]; then
  MC_SCENARIOS=hard MC_FIG_SCENARIO=hard \
  timeout 7200 $PY scripts/method_comparison.py 50 \
    results/e2e_r4_hard artifacts/method_comparison_hard
fi
