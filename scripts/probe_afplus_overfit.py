"""AF+ bilevel overfit probe: is the OUTER gradient a real learning signal?

The round-2 10000-step run logged a flat outer loss (~0.878) with
intermittent ~1e14 gradient norms.  Two hypotheses:

  (a) the bilevel gradient through the 30-step unrolled inner autofocus is
      too noisy/ill-conditioned to shape the metric net at all;
  (b) the signal is real but the accumulation was poisoned: MultiSteps
      averages RAW per-sample grads, so one 1e14-gnorm outlier dominates
      the 16-sample mean and the post-accumulation clip merely normalizes
      the OUTLIER's direction (the reference instead runs
      clip_grad_norm_(1.0) after every sample's backward,
      train_afplus_original.py:207-208 — bounded per-sample influence).

This probe decides between them with the cheapest possible experiment:
overfit a FIXED set of draws with accumulate=1 (every step is an optimizer
update) and per-sample clipping on, and watch whether the outer loss on
those fixed draws decreases.  If it does, (b): restart the long run with
sample_clip_norm.  If it stays flat even here, (a): the trainer needs a
deeper diagnosis before burning device-hours.

Usage: python scripts/probe_afplus_overfit.py [steps=150] [pool=4]
          [size=320] [clip=1.0] [inner=30] [chans=32] [pools=6]
          [variant=rot_detach: ref|rot_detach|eps|both|precond_detach|
           precond_cot]

(chans/pools size the metric U-Net: the reference arch is 32/6 — 440 MB
with opt state, machine-local only; 16/5 is the committed-distribution
size used for denoiser_full, and a faster bilevel step.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_afplus import (
    AFPlusTrainConfig,
    make_afplus_trainer,
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    pool = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    clip = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    inner = int(sys.argv[5]) if len(sys.argv) > 5 else 30
    chans = int(sys.argv[6]) if len(sys.argv) > 6 else 32
    pools = int(sys.argv[7]) if len(sys.argv) > 7 else 6
    variant = sys.argv[8] if len(sys.argv) > 8 else "rot_detach"

    images = phantom_stack(pool, size, size, seed=3)
    kspace = jax.jit(fft2c)(images)

    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=chans,
                                num_pool_layers=pools, norm="instance"))
    # steps=20000 keeps the cosine schedule near-constant across the probe's
    # ~150 updates (the horizon is steps//accumulate); accumulate=1 makes
    # every sample an optimizer update so learning shows up immediately.
    cfg = AFPlusTrainConfig(
        steps=20000, inner_iters=inner, accumulate=1,
        rot_moment_detach=variant in ("rot_detach", "both"),
        inner_eps=1e-12 if variant in ("eps", "both") else 0.0,
        precond_detach=variant in ("precond_detach", "precond_cot"),
        cotangent_clip=1.0 if variant == "precond_cot" else 0.0,
        sample_clip_norm=clip,
    )
    init_fn, train_step, _ = make_afplus_trainer(net, cfg,
                                                 image_shape=(size, size))
    key = jax.random.PRNGKey(228)
    params, opt_state = init_fn(jax.random.PRNGKey(1))

    # FIXED draws: the same (kspace, sim key) pairs cycle, so the loss
    # sequence on each pool index is directly comparable across epochs.
    sim_keys = [jax.random.fold_in(key, i) for i in range(pool)]

    losses, gnorms = [], []
    t0 = time.time()
    for i in range(steps):
        idx = i % pool
        params, opt_state, stats = train_step(
            params, opt_state, sim_keys[idx], kspace[idx]
        )
        losses.append(float(stats["loss"]))
        gnorms.append(float(stats["gnorm"]))
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i} idx {idx} loss {losses[-1]:.5f} "
                  f"gnorm {gnorms[-1]:.3e} ({time.time()-t0:.0f}s)",
                  flush=True)

    arr = np.asarray(losses)
    g = np.asarray(gnorms)
    gf = g[np.isfinite(g)]  # all-NaN runs (observed!) must still report
    k = max(pool * 3, 12)  # compare whole-pool epochs, not single draws
    out = {
        "steps": steps, "pool": pool, "size": size, "clip": clip,
        "chans": chans, "pools": pools, "variant": variant,
        "first_loss_mean": round(float(arr[:k].mean()), 5),
        "last_loss_mean": round(float(arr[-k:].mean()), 5),
        "delta": round(float(arr[-k:].mean() - arr[:k].mean()), 5),
        "gnorm_median": float(np.median(gf)) if gf.size else None,
        "gnorm_max": float(np.max(gf)) if gf.size else None,
        "nonfinite_frac": round(float(np.mean(~np.isfinite(g))), 4),
        "outlier_frac_gt_10x_median": (
            round(float(np.mean(gf > 10 * np.median(gf))), 4)
            if gf.size else None
        ),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
