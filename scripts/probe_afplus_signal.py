"""AF+ metric-signal probe: is the bilevel training learning anything?

The in-flight 10000-step rot_detach run logs a flat outer loss (~0.878,
= denoiser_loss(AF+ output, GT) after the 30-iteration inner autofocus),
which could mean (a) the outer gradient is not shaping the metric net, or
(b) the loss is dominated by a floor term while the metric still improves.
This probe measures the thing the loss is a proxy for: AF+ correction
quality on held-out corrupted slices, comparing metric nets
(reference protocol: test_afplus_original.py evaluates the trained net on
the frozen corpora; here trained-vs-untrained isolates the training delta).

  corrupted : no correction (|IFFT(k)| of the corrupted k-space)
  untrained : AF+ (80 iters) with the metric U-Net at random init
  trained   : AF+ (80 iters) with the given checkpoint (default: the
              in-flight artifacts/afplus_full/afplus_rot_detach)

If trained ~= untrained after thousands of steps, further training hours
are wasted and the trainer needs a diagnosis (lr, inner_iters, loss
scale); if trained > untrained, let the run finish.

Usage: python scripts/probe_afplus_signal.py [n=6] [scenario=light]
           [iters=80] [ckpt=artifacts/afplus_full/afplus_rot_detach]
           [size=320] [chans=32] [pools=6]

(size != 320 skips the checkpoint unless it matches the U-Net's trained
raster — the net is fully convolutional, so any size loads, but trained
weights are only meaningful at 320.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax

if os.environ.get("PROBE_CPU"):
    # The env pins JAX_PLATFORMS=axon via sitecustomize; the env var alone
    # does not override it — force the backend in-process like
    # tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from miccai24_immoco_tpu.cli import _load_ckpt, _synthetic_corpus, _unwrap_params
from miccai24_immoco_tpu.config import AFPlusConfig, UnetConfig
from miccai24_immoco_tpu.eval.runners import _metrics_dict, run_afplus
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.utils.hostio import put_complex


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    scenario = sys.argv[2] if len(sys.argv) > 2 else "light"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    # Default = the COMMITTED registry entry (ADVICE r2 #2: the old
    # afplus_full default was gitignored and lost to the between-round
    # disk wipe; a no-arg invocation must work on a fresh clone).
    ckpt = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join("artifacts", "afplus_small", "afplus_t8")
    )
    size = int(sys.argv[5]) if len(sys.argv) > 5 else 320
    chans = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    pools = int(sys.argv[7]) if len(sys.argv) > 7 else 5

    # Held-out draw: the trainer's corpus uses seed 0 phantoms; probe on a
    # different seed so the comparison is not on memorized slices.
    corpus = _synthetic_corpus(n, size, scenario, seed=7)

    net = build_unet(
        UnetConfig(in_chans=1, out_chans=1, chans=chans, num_pool_layers=pools,
                   norm="instance")
    )
    trained = _unwrap_params(_load_ckpt(ckpt))
    untrained = net.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, size, size, 1), jnp.float32),
        train=False,
    )["params"]

    def metric_apply(p, img):
        return net.apply(
            {"params": p}, img[None, :, :, None], train=False
        )[0, :, :, 0]

    # matmul-mode NUFFT builds dense (N, G) one-hot matrices sized for the
    # MXU; on CPU the tap-loop scatter backend is the tractable one.
    cfg = AFPlusConfig(
        iters=iters,
        nufft_mode="scatter" if os.environ.get("PROBE_CPU") else "matmul",
    )
    rows = {}
    corrupted = [
        _metrics_dict(
            ifft2c(put_complex(corpus["kspace_motion"][i])),
            put_complex(corpus["image_rss"][i]),
        )
        for i in range(n)
    ]
    rows["corrupted"] = corrupted
    for name, params in (("untrained", untrained), ("trained", trained)):
        # Params threaded as a jit argument (statics discipline): both nets
        # share one compiled fit, and the 28 MB checkpoint never gets baked
        # into the HLO (the remote compiler 413s on constant-folded params).
        rows[name] = run_afplus(
            corpus, cfg=cfg, metric_apply=metric_apply, params=params
        )
        agg = {
            k: round(float(np.mean([m[k] for m in rows[name]])), 4)
            for k in rows[name][0]
        }
        print(name, json.dumps(agg))

    summary = {
        name: {
            k: round(float(np.mean([m[k] for m in ms])), 4) for k in ms[0]
        }
        for name, ms in rows.items()
    }
    summary["delta_trained_minus_untrained"] = {
        k: round(summary["trained"][k] - summary["untrained"][k], 4)
        for k in summary["trained"]
    }
    print(json.dumps({"n": n, "scenario": scenario, "iters": iters,
                      "ckpt": ckpt, **summary}, indent=2))


if __name__ == "__main__":
    main()
