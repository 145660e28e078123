"""Localize the AF+ bilevel outer-gradient NaN to a primitive.

probe_afplus_overfit measured the outer gradient non-finite on EVERY draw
at init, for rot_detach AND precond_detach — so the blow-up is not (only)
the inner-Adam rsqrt chain.  This probe runs the exact trainer loss at a
small size on CPU with jax_debug_nans, which re-executes op-by-op at the
first NaN and reports the producing primitive + traceback.

Usage: python scripts/probe_afplus_nan_bisect.py [size=64] [inner=5]
          [chans=8] [pools=3] [variant=precond_detach] [x64=0]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

import jax.numpy as jnp

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_afplus import (
    AFPlusTrainConfig,
    make_afplus_trainer,
)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    chans = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pools = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    variant = sys.argv[5] if len(sys.argv) > 5 else "precond_detach"
    if len(sys.argv) > 6 and sys.argv[6] == "1":
        jax.config.update("jax_enable_x64", True)

    images = phantom_stack(1, size, size, seed=3)
    kspace = fft2c(images)

    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=chans,
                                num_pool_layers=pools, norm="instance"))
    cfg = AFPlusTrainConfig(
        steps=20000, inner_iters=inner, accumulate=1, nufft_chunk=0,
        rot_moment_detach=variant in ("rot_detach", "both"),
        inner_eps=1e-12 if variant in ("eps", "both") else 0.0,
        precond_detach=variant == "precond_detach",
        sample_clip_norm=1.0,
    )
    init_fn, train_step, _ = make_afplus_trainer(net, cfg,
                                                 image_shape=(size, size))
    params, opt_state = init_fn(jax.random.PRNGKey(1))
    key = jax.random.fold_in(jax.random.PRNGKey(228), 0)
    print(f"running train_step size={size} inner={inner} chans={chans} "
          f"pools={pools} variant={variant} (debug_nans on)...", flush=True)
    params, opt_state, stats = train_step(params, opt_state, key, kspace[0])
    print({k: float(v) for k, v in stats.items()})
    print("NO NaN at this config")


if __name__ == "__main__":
    main()
