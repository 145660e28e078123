"""Probe: can the learned baselines win on a reference-regime corpus?

VERDICT r3 missing #2: on the default phantom corpora the corrupted
baseline is too good (SSIM ~0.95 light / ~0.88 heavy) for the U-Net
denoiser or AF+ to improve it — the reference's fastMRI tables live at
corrupted SSIM ~0.7-0.85.  This probe evaluates corrupted / denoiser /
autofocusing / AF+ on N slices of candidate "hard" sim configs to pick the
scenario definition where the reference ordering (all methods >= corrupted)
is reproducible, BEFORE freezing the 50-slice artifact.

Usage: python scripts/probe_hard_regime.py [n=8] [candidates=A,B]
Env: HR_AF_ITERS / HR_AFP_ITERS (default 80)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.metrics import calmetric2d, center_crop_quarter
from miccai24_immoco_tpu.utils.hostio import put_complex, readback

from miccai24_immoco_tpu.config import (
    AFPlusConfig,
    AutofocusingConfig,
    MotionSimConfig,
    UnetConfig,
)

CANDIDATES = {
    # name -> (n_movements, MotionSimConfig, noisy_gt)
    # [corrupted SSIM on 4 slices in the comment]
    "A": (18, MotionSimConfig(shift_range=(-15, 15), rotate_range=(-15, 15),
                              width_range=(1, 16)), True),   # ~0.77
    "B": (12, MotionSimConfig(shift_range=(-15, 15), rotate_range=(-15, 15),
                              width_range=(4, 16)), True),   # ~0.80
    "C": (12, MotionSimConfig(shift_range=(-12, 12), rotate_range=(-12, 12),
                              width_range=(6, 20)), True),   # ~0.76
    # Noise-FREE variants: the phantom texture noise is unreproducible by
    # any resampling method (the unitary-corruption realization confound,
    # PERFORMANCE.md "Heavy-PSNR root cause"), so the reference-regime
    # scenario corrupts the noise-free twin and scores against it.
    "D": (18, MotionSimConfig(shift_range=(-15, 15), rotate_range=(-15, 15),
                              width_range=(4, 20)), False),  # ~0.83
    "E": (24, MotionSimConfig(shift_range=(-15, 15), rotate_range=(-15, 15),
                              width_range=(1, 16)), False),  # ~0.81
    # T = the COMMITTED hard scenario (round 4 final): heavy sim severity
    # on the structured-texture noise-free phantom (texture 0.15, sigma 2)
    # — corrupted ~0.80 with every method inside its operating envelope.
    "T": (18, MotionSimConfig(), False),
}
TEXTURES = {"T": 0.15}


def corpus_for(n, size, nmov, sim_cfg, seed=2024, noise=True, texture=0.0):
    from miccai24_immoco_tpu.data.synthetic import phantom_stack
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
    from miccai24_immoco_tpu.utils.hostio import get_complex

    images = phantom_stack(n, size, size, seed=seed, noise=noise,
                           texture=texture)
    sims = simulate_motion_batch(
        jax.random.PRNGKey(seed), images, n_movements=nmov, cfg=sim_cfg,
        max_movements=24,
    )
    return {
        "kspace_motion": get_complex(sims.kspace),
        "image_rss": get_complex(images),
        "mask": np.asarray(sims.mask),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = (sys.argv[2] if len(sys.argv) > 2 else "A,B").split(",")

    from miccai24_immoco_tpu import weights
    from miccai24_immoco_tpu.cli import _load_denoiser
    from miccai24_immoco_tpu.eval.harness import aggregate
    from miccai24_immoco_tpu.eval.runners import (
        run_afplus,
        run_autofocusing,
        run_denoiser,
    )
    from miccai24_immoco_tpu.models.unet import build_unet
    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

    kld = weights.load_kld(weights.best_kld_name())
    den_net, den_params = _load_denoiser("denoiser_full")
    tree, meta = restore_with_meta(weights.path_of("afplus_small"))
    afp_params = (
        tree["params"] if isinstance(tree, dict) and "params" in tree else tree
    )
    arch = meta.get("unet", {})
    afp_net = build_unet(UnetConfig(
        in_chans=1, out_chans=1, chans=arch.get("chans", 16),
        num_pool_layers=arch.get("num_pool_layers", 5), norm="instance"))

    def metric_apply(p, img):
        return afp_net.apply({"params": p}, img[None, :, :, None],
                             train=False)[0, :, :, 0]

    af_iters = int(os.environ.get("HR_AF_ITERS", "80"))
    afp_iters = int(os.environ.get("HR_AFP_ITERS", "80"))

    summary = {}
    for name in names:
        nmov, sim_cfg, noisy = CANDIDATES[name]
        corpus = corpus_for(n, 320, nmov, sim_cfg, noise=noisy,
                            texture=TEXTURES.get(name, 0.0))
        @jax.jit
        def _corr(ksp_b, gt_b):
            def one(ksp, gt):
                m = calmetric2d(
                    center_crop_quarter(jnp.abs(ifft2c(ksp)))[None, None],
                    center_crop_quarter(jnp.abs(gt))[None, None],
                )
                return jnp.stack([m.ssim, m.psnr, m.haarpsi])

            return jax.vmap(one)(ksp_b, gt_b)

        vals = readback(_corr(put_complex(corpus["kspace_motion"]),
                              put_complex(corpus["image_rss"])))
        rows = {"corrupted": [
            {"ssim": float(v[0]), "psnr": float(v[1]), "haar_psi": float(v[2])}
            for v in vals
        ]}
        rows["denoiser"] = run_denoiser(corpus, den_net, den_params, limit=n)
        rows["autofocusing"] = run_autofocusing(
            corpus, cfg=AutofocusingConfig(iters=af_iters), kld=kld, limit=n)
        rows["af_plus"] = run_afplus(
            corpus, cfg=AFPlusConfig(iters=afp_iters), limit=n,
            metric_apply=metric_apply, params=afp_params)
        summary[name] = {
            m: {k: round(v["mean"], 4)
                for k, v in aggregate(r).items()
                if k in ("ssim", "psnr", "haar_psi")}
            for m, r in rows.items()
        }
        print(name, json.dumps(summary[name], indent=1), flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
