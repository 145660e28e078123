"""Fine-tune the distributed denoiser on the round-4 "hard" distribution.

The reference's denoiser demonstrably improves its inputs in the fastMRI
regime (corrupted SSIM ~0.7-0.85, src/test/test_unet_denoiser.py:53-158).
Round-4 probes (scripts/probe_hard_regime.py) show denoiser_full — trained
on the DEFAULT sim severity — already wins PSNR/HaarPSI on the noise-free
hard scenario but loses ~0.013 SSIM: it is out of distribution (the hard
scenario corrupts with rot/shift +-15, widths 4-20, noise-free phantoms).
This fine-tunes denoiser_full in-distribution for a few thousand steps,
gated on held-out SSIM improvement exactly like the full recipe.

Usage: python scripts/train_denoiser_hard.py [steps=2000] [out]
Env: DH_SEED (0); DH_FROM (denoiser_full) start checkpoint;
DH_CROP=1 switches loss SSIM term + checkpoint gate to the eval
protocol's quarter-crop minmax SSIM (train_denoiser.denoiser_loss_crop)
— the round-4 lever for the whole-image-gate/crop-eval mismatch.
DH_GATE=protocol (round 5, VERDICT r4 next #3): the best-checkpoint gate
becomes a FROZEN multi-sample validation set — 16 phantoms at distinct
seeds with a FIXED hard-severity corruption drawn once — scored every 100
steps with the eval protocol's per-slice quarter-crop minmax SSIM of the
plain forward.  The round-4 gate scored fresh single-draw corruptions
in-graph, which measurably overfits a lucky severity draw (the DH_CROP
fine-tune won its own gate by +0.037 yet lost 0.033 at protocol scale).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import MotionSimConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_denoiser import (
    DenoiserTrainConfig,
    make_denoiser_trainer,
)
from miccai24_immoco_tpu.utils.checkpoint import save

# The committed "hard" scenario definition (cli._synthetic_corpus):
# heavy sim severity on the textured noise-free phantom.  Mixed-severity
# draw (default n_movements 5-20): a fixed-18 variant was measured WORSE
# on the 50-slice eval (0.836 vs 0.843 quarter-crop ssim) despite a
# higher internal gain (+0.275) — the trainer's whole-image minmax ssim
# rewards background-ringing cleanup the quarter-crop protocol never
# sees, so matching the eval's draw does not transfer.
HARD_SIM = MotionSimConfig()
TEXTURE = 0.15


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "denoiser_hard",
        "denoiser_hard",
    )
    seed = int(os.environ.get("DH_SEED", "0"))
    crop_match = os.environ.get("DH_CROP", "0") == "1"
    from_ckpt = os.environ.get("DH_FROM", "denoiser_full")

    from miccai24_immoco_tpu.cli import _load_denoiser

    net, params = _load_denoiser(from_ckpt)

    # Noise-free phantom corpus, DISTINCT seed range from the frozen
    # seed-2024 eval corpora (train seeds 0..47 vs eval 2024..2073).
    images = phantom_stack(48, 320, 320, seed=seed, noise=False,
                           texture=TEXTURE)
    ksp = jax.jit(fft2c)(images)
    train, val = ksp[:40], ksp[40:]

    cfg = DenoiserTrainConfig(steps=steps)
    init_fn, _, _, segment_fn = make_denoiser_trainer(
        net, cfg, HARD_SIM, (320, 320), crop_match=crop_match
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, ik = jax.random.split(key)
    _params0, opt_state = init_fn(ik)
    del _params0  # fine-tune: start from the distributed checkpoint

    gate = os.environ.get("DH_GATE", "")
    val_fn = None
    if gate == "protocol":
        import numpy as np

        from miccai24_immoco_tpu.eval.runners import _metrics_dict
        from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
        from miccai24_immoco_tpu.train.train_denoiser import denoise

        # Frozen 16-slice validation corpus: seeds 500.. (disjoint from the
        # train 0..47 and eval 2024..2073 ranges), ONE fixed corruption.
        vimg = phantom_stack(16, 320, 320, seed=500, noise=False,
                             texture=TEXTURE)
        vsim = simulate_motion_batch(
            jax.random.PRNGKey(500), vimg, cfg=HARD_SIM
        )
        vksp = vsim.kspace
        vgt = vimg
        _den = jax.jit(lambda p, k: denoise(net, p, k))

        def val_fn(p):
            ss = []
            for i in range(vksp.shape[0]):
                out = _den(p, vksp[i][None])[0]
                ss.append(_metrics_dict(out, vgt[i])["ssim"])
            return float(np.mean(ss))

        base_ssim = None  # corrupted baseline, computed once below

    best_gain = jnp.asarray(-jnp.inf, jnp.float32)
    best_params = params
    # Protocol gate keeps ITS OWN snapshot: segment_fn overwrites
    # best_params with the in-graph gain gate every segment, so mixing the
    # two silently ships the gain-gated params (caught round 5: the first
    # DH_GATE=protocol run saved bit-identical params to the round-4
    # gain-gated checkpoint).
    best_val = -float("inf")
    best_params_proto = params
    done = 0
    t0 = time.time()
    while done < steps:
        seg = min(20, steps - done)
        (params, opt_state, key, best_gain, best_params, losses, stats) = (
            segment_fn(
                params, opt_state, key, train, val, best_gain, best_params,
                seg_len=seg,
            )
        )
        done += seg
        if done % 100 < seg or done >= steps:
            if val_fn is not None:
                v = val_fn(params)
                if v > best_val:
                    best_val = v
                    best_params_proto = params
                extra_log = f" val_ssim {v:.4f} best_val {best_val:.4f}"
            else:
                extra_log = ""
            print(
                f"step {done}: loss {float(losses[-1]):.4f} "
                f"ssim {float(stats['ssim'][-1]):.4f} "
                f"gain {float(stats['ssim_gain'][-1]):+.4f} "
                f"best {float(best_gain):+.4f}" + extra_log +
                f" ({(time.time()-t0)/done:.2f} s/step)",
                flush=True,
            )
            save(out,
                 best_params_proto if val_fn is not None else best_params, {
                "unet": {"in_chans": 1, "out_chans": 1,
                         "chans": net.chans,
                         "num_pool_layers": net.num_pool_layers,
                         "norm": "instance"},
                "steps_done": done,
                "best_gain": float(best_gain),
                "finetuned_from": from_ckpt,
                "crop_match": crop_match,
                "gate": gate or "in-graph ssim_gain (round-4 recipe)",
                "best_val_ssim": (best_val if val_fn is not None else None),
                "sim": "hard (heavy sim severity, textured noise-free phantom)",
            })
    print("final best_gain", float(best_gain), "->", out)


if __name__ == "__main__":
    main()
