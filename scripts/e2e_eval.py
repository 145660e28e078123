"""End-to-end IM-MoCo evaluation on TPU: klD-Net detection -> movement
grouping -> batched 200-iteration instance fits -> quarter-crop metrics,
reports and comparison figures — the full test_immoco.py pipeline parity
demo, on synthetic corpora.

Usage: python scripts/e2e_eval.py [n_slices] [light,heavy]
Writes results/e2e/immoco.{json,tex}, violins, and per-scenario PNGs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu import weights
from miccai24_immoco_tpu.cli import _synthetic_corpus
from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.eval.harness import aggregate, comparison_figure, save_report
from miccai24_immoco_tpu.eval.runners import run_immoco_batched
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.utils.hostio import put_complex, readback


def corruption_metrics(corpus, n):
    @jax.jit
    def one(ksp, gt):
        m = calmetric2d(
            center_crop_quarter(jnp.abs(ifft2c(ksp)))[None, None],
            center_crop_quarter(jnp.abs(gt))[None, None],
        )
        return jnp.stack([m.ssim, m.psnr, m.haarpsi, m.rmse])

    names = ("ssim", "psnr", "haar_psi", "rmse")
    clean = corpus.get("image_clean")
    out = []
    for i in range(n):
        ksp = put_complex(corpus["kspace_motion"][i])
        vals = readback(one(ksp, put_complex(corpus["image_rss"][i])))
        d = dict(zip(names, map(float, vals)))
        if clean is not None:
            cvals = readback(one(ksp, put_complex(clean[i])))
            d.update({f"{k}_clean": float(v)
                      for k, v in zip(names, cvals)})
        out.append(d)
    return out


def _make_scorer(name_or_path: str):
    """Registry name / checkpoint path -> jitted no-reference artifact
    score fn: mean(x*1e4*sigmoid(net(x*1e4))) — the AF+ inner objective
    (models/af_plus.py:13) evaluated on a magnitude image."""
    from miccai24_immoco_tpu.config import UnetConfig
    from miccai24_immoco_tpu.models.unet import build_unet
    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta
    from miccai24_immoco_tpu.weights import path_of

    tree, meta = restore_with_meta(path_of(name_or_path))
    params = (tree["params"] if isinstance(tree, dict) and "params" in tree
              else tree)
    arch = meta.get("unet", {})
    net = build_unet(UnetConfig(
        in_chans=1, out_chans=1, chans=arch.get("chans", 16),
        num_pool_layers=arch.get("num_pool_layers", 5), norm="instance"))

    @jax.jit
    def score(p, img):
        logits = net.apply({"params": p}, (img * 1e4)[None, :, :, None],
                           train=False)[0, :, :, 0]
        return jnp.mean(img * 1e4 * jax.nn.sigmoid(logits))

    return lambda img: score(params, img)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scenarios = (sys.argv[2] if len(sys.argv) > 2 else "light,heavy").split(",")
    kld_name = weights.best_kld_name()
    kld = weights.load_kld(kld_name) if weights.available(kld_name) else None
    print("detector:", f"klD-Net ({kld_name})" if kld else "oracle masks",
          flush=True)

    per_scenario = {}
    per_scenario_corrupt = {}
    meta: dict = {"scenarios": {}}
    # Tiny-scale verification knobs (protocol defaults: 320² / 200 iters).
    size = int(os.environ.get("E2E_SIZE", "320"))
    iters = int(os.environ.get("E2E_ITERS", "200"))
    for scenario in scenarios:
        max_mov = 12 if scenario == "light" else 24
        cfg = InstanceFitConfig(
            iters=iters,
            max_movements=max_mov,
            image_inr=ImageINRConfig(encoding="lattice"),
            motion_inr=MotionINRConfig(encoding="lattice"),
            # E2E_DISPCAP: displacement cap; >31 also widens the frozen-
            # tail tile so the tiled frozen weights stay exact (the hard
            # scenario runs E2E_WARP=matmul E2E_DISPCAP=50 — the dense
            # warp is displacement-unbounded like the reference).
            motion_disp_px=float(os.environ.get("E2E_DISPCAP", "30")),
            motion_freeze_tile_px=(
                64 if float(os.environ.get("E2E_DISPCAP", "30")) > 31 else 32
            ),
            warp_impl=os.environ.get("E2E_WARP", "pallas_tiled"),
            compute_dtype=os.environ.get("E2E_DTYPE", "bfloat16"),
            dc_replace=bool(int(os.environ.get("E2E_DC", "0"))),
            motion_res_factor=int(os.environ.get("E2E_MOTRES", "1")),
            ema_decay=float(os.environ.get("E2E_EMA", "0")),
            ema_start_frac=float(os.environ.get("E2E_EMA_START", "0.5")),
            coarse_schedule=tuple(
                tuple(int(v) for v in p.split("@"))
                for p in os.environ.get("E2E_C2F", "").split("+") if p
            ),
            motion_freeze_iters=int(os.environ.get("E2E_FREEZE", "0")),
            # Joint-span duty cycling (config.motion_duty), e.g.
            # E2E_DUTY=10x10 — the measured heavy win (PERFORMANCE.md).
            motion_duty=(
                tuple(int(v) for v in os.environ["E2E_DUTY"].split("x"))
                if os.environ.get("E2E_DUTY")
                else ()
            ),
            motion_duty_start=int(os.environ.get("E2E_DUTY_START", "0")),
            # Annealed displacement-L2 (config.py lambda_motion_anneal_frac
            # rationale): E2E_LM=10000 E2E_LM_ANNEAL=0.3 pins motion ~0
            # through the basin-forming early iterations, then releases.
            lambda_motion=float(os.environ.get("E2E_LM", "0")),
            lambda_motion_anneal_frac=float(
                os.environ.get("E2E_LM_ANNEAL", "0")),
            # Identity-column recentering gate (config.recenter_max_px):
            # undoes the degenerate common-mode shift when a movement band
            # owns the k-space center (ops/recenter.py).
            recenter_max_px=float(os.environ.get("E2E_RECENTER", "0")),
            # E2E_LGE: gradient-entropy weight (config.lambda_ge, reference
            # immoco.py:116-117 default 1e-2).  The hard scenario's textured
            # phantoms are penalized by the smoothing prior, so the hard
            # sweep tunes this down (VERDICT r4 next #5).
            lambda_ge=float(os.environ.get("E2E_LGE", "1e-2")),
        )
        corpus = _synthetic_corpus(n, size, scenario, seed=2024)
        import time as _time

        buckets_env = os.environ.get("E2E_BUCKETS")
        buckets = ([int(b) for b in buckets_env.split(",")]
                   if buckets_env else ([10] if scenario == "light" else [18]))
        t0 = _time.time()
        extra = {}
        if os.environ.get("E2E_FALLBACK_DISP"):
            extra["fallback_disp_px"] = float(os.environ["E2E_FALLBACK_DISP"])
        if os.environ.get("E2E_FALLBACK_LOSS"):
            extra["fallback_loss"] = float(os.environ["E2E_FALLBACK_LOSS"])
        if os.environ.get("E2E_RESTARTS"):
            extra["restarts"] = int(os.environ["E2E_RESTARTS"])
            extra["restart_select"] = os.environ.get("E2E_SELECT", "loss")
        if os.environ.get("E2E_SCORER"):
            # Learned no-reference do-no-harm selector: the AF+ metric
            # net's objective as an artifact score (runners.py
            # fallback_scorer rationale).  E2E_SCORER = registry name or
            # checkpoint path; arch from the checkpoint's "unet" block.
            extra["fallback_scorer"] = _make_scorer(os.environ["E2E_SCORER"])
            if os.environ.get("E2E_SCORER_MARGIN"):
                extra["fallback_scorer_margin"] = float(
                    os.environ["E2E_SCORER_MARGIN"])
        want_diag = bool(int(os.environ.get("E2E_DIAG", "0"))) or extra
        out = run_immoco_batched(
            corpus, cfg, kld=kld, limit=n, batch_size=min(n, 4),
            segment_len=min(50, iters), buckets=buckets,
            return_diagnostics=want_diag, **extra,
        )
        metrics, diags = out if want_diag else (out, None)
        wall = _time.time() - t0
        from miccai24_immoco_tpu.eval import runners as _runners
        meta.setdefault("timing", {})[scenario] = _runners.LAST_TIMING
        print(f"{scenario}: {wall:.1f}s wall for {n} slices "
              f"({wall/n:.2f} s/slice incl. detection+compile)", flush=True)
        meta["scenarios"][scenario] = {
            "n": n,
            "wall_s_total": round(wall, 1),
            "wall_s_per_slice": round(wall / n, 2),
            "buckets": buckets,
            "config": {
                "iters": cfg.iters,
                "max_movements": cfg.max_movements,
                "warp_impl": cfg.warp_impl,
                "compute_dtype": cfg.compute_dtype,
                "motion_disp_px": cfg.motion_disp_px,
                "motion_res_factor": cfg.motion_res_factor,
                "dc_replace": cfg.dc_replace,
                "ema_decay": cfg.ema_decay,
                "coarse_schedule": list(map(list, cfg.coarse_schedule)),
                "motion_freeze_iters": cfg.motion_freeze_iters,
                "motion_duty": list(cfg.motion_duty),
                "motion_duty_start": cfg.motion_duty_start,
                "lambda_motion": cfg.lambda_motion,
                "lambda_motion_anneal_frac": cfg.lambda_motion_anneal_frac,
                "recenter_max_px": cfg.recenter_max_px,
            },
        }
        per_scenario[scenario] = metrics
        per_scenario_corrupt[scenario] = corruption_metrics(corpus, n)
        if diags is not None:
            meta["scenarios"][scenario]["fallback_knobs"] = {
                k: (v if isinstance(v, (int, float, str, bool)) else
                    os.environ.get("E2E_SCORER", str(type(v).__name__)))
                for k, v in extra.items()
            }
            import json as _json

            _dout = os.environ.get("E2E_OUT", "results/e2e")
            os.makedirs(_dout, exist_ok=True)
            with open(f"{_dout}/diags_{scenario}.json", "w") as f:
                _json.dump(diags, f, indent=2)
        print(scenario, "corrected:", aggregate(metrics), flush=True)
        print(scenario, "corrupted:", aggregate(per_scenario_corrupt[scenario]),
              flush=True)

    # E2E_OUT: report directory override — lets per-scenario tuned configs
    # run as separate invocations (different env knobs) and merge into one
    # artifact dir afterwards (round-3 protocol run, VERDICT r2 next#2).
    out_dir = os.environ.get("E2E_OUT", "results/e2e")
    save_report(per_scenario, out_dir, "immoco")
    save_report(per_scenario_corrupt, out_dir, "corrupted_baseline")
    import json as _json

    import jax as _jax

    meta["device"] = str(_jax.devices()[0].device_kind)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        _json.dump(meta, f, indent=2)
    print("reports in", out_dir, flush=True)


if __name__ == "__main__":
    main()
