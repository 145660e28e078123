"""Final gate for the subtle-lesion geometry: the matched-template proxy
accuracy on motion-free / heavy-corrupted / IM-MoCo-corrected patches.

probe_lesion_cue.py tunes the geometry so corruption destroys the cue;
this probe (TPU) adds the recovery leg — the reference protocol needs
accuracy to DROP under corruption and RECOVER under correction
(test_classification.py:65-100), so a geometry whose ring the GE prior
smooths away would fail the story in the other direction.

Usage: python scripts/probe_lesion_recovery.py [n] [geom ...]
  geom: name=R,sigma,blob,amp_lo,amp_hi (default the G/D finalists)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    ImageINRConfig,
    InstanceFitConfig,
    MotionINRConfig,
)
from miccai24_immoco_tpu.data.lesions import lesion_phantom_np
from miccai24_immoco_tpu.eval.downstream import extract_patches
from miccai24_immoco_tpu.models.immoco import build_immoco
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.parallel.sharded_fit import make_batched_segmented_fit
from miccai24_immoco_tpu.utils.hostio import put_complex

from probe_lesion_cue import best_threshold_acc, template_stat  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = 320
    geoms = {}
    for spec in sys.argv[2:]:
        name, vals = spec.split("=")
        r, s, b, lo, hi = (float(v) for v in vals.split(","))
        geoms[name] = dict(ring_radius=r, ring_sigma=s, blob_sigma=b,
                           amp_lo=lo, amp_hi=hi)
    if not geoms:
        geoms = {
            "G": dict(ring_radius=2.8, ring_sigma=1.0, blob_sigma=2.0,
                      amp_lo=0.22, amp_hi=0.30),
            "D": dict(ring_radius=2.5, ring_sigma=0.9, blob_sigma=1.8,
                      amp_lo=0.22, amp_hi=0.30),
        }

    cfg = InstanceFitConfig(
        iters=200,
        max_movements=24,
        image_inr=ImageINRConfig(encoding="lattice"),
        motion_inr=MotionINRConfig(encoding="lattice"),
        motion_disp_px=30,
        warp_impl=(
            "pallas_tiled" if jax.default_backend() != "cpu" else "matmul"
        ),
        compute_dtype=(
            "bfloat16" if jax.default_backend() != "cpu" else "float32"
        ),
        motion_res_factor=2,
        dc_replace=True,
        coarse_iters=50,
        coarse_size=256,
    )
    model = build_immoco(cfg, size, size)
    run = make_batched_segmented_fit(model, segment_len=50)
    groups = jax.jit(
        lambda ind: extract_movement_groups(ind, size, cfg.max_movements)
    )
    batch = 4

    scen = {"light": (6, 9), "heavy": (16, 19)}
    sel = os.environ.get("PROBE_SCEN", "light,heavy").split(",")
    for name, g in geoms.items():
        rng = np.random.default_rng(7)
        labels, s_free, centers, imgs = [], [], [], []
        for i in range(n):
            cls = i % 2
            ph, c = lesion_phantom_np(size, size, seed=1000 + i, cls=cls,
                                      variant="subtle", subtle_geom=g)
            labels.append(cls)
            centers.append(c)
            img = put_complex(ph)
            imgs.append(img)
            cj = jnp.asarray(c[None])
            p_free = np.asarray(extract_patches(jnp.abs(img), cj, 124)[0])
            s_free.append(template_stat(p_free, g))
        labels = np.asarray(labels)
        line = f"{name}: free={best_threshold_acc(np.asarray(s_free), labels):.3f}"
        for scenario in sel:
            lo, hi = scen[scenario]
            s_corr, s_fit, ksp_list, mask_list = [], [], [], []
            for i in range(n):
                n_mov = int(rng.integers(lo, hi + 1))
                sim = simulate_motion_2d(
                    jax.random.PRNGKey(1000 + 2 * i + 1), imgs[i],
                    n_movements=n_mov,
                )
                cj = jnp.asarray(centers[i][None])
                p_corr = np.asarray(
                    extract_patches(jnp.abs(ifft2c(sim.kspace)), cj, 124)[0]
                )
                s_corr.append(template_stat(p_corr, g))
                ksp_list.append(sim.kspace)
                m, _ = groups(sim.mask[0] > 0)
                mask_list.append(m)
            key = jax.random.PRNGKey(0)
            for a in range(0, n, batch):
                ks_b = jnp.stack(ksp_list[a : a + batch])
                m_b = jnp.stack(mask_list[a : a + batch])
                keys = jnp.stack(
                    [jax.random.fold_in(key, i) for i in range(a, a + batch)]
                )
                r = run(ks_b, m_b, keys, model.statics)
                for j in range(ks_b.shape[0]):
                    cj = jnp.asarray(centers[a + j][None])
                    p_fit = np.asarray(
                        extract_patches(jnp.abs(r.image[j]), cj, 124)[0]
                    )
                    s_fit.append(template_stat(p_fit, g))
            line += (
                f"  {scenario}: corrupted="
                f"{best_threshold_acc(np.asarray(s_corr), labels):.3f} "
                f"immoco={best_threshold_acc(np.asarray(s_fit), labels):.3f}"
            )
            print(line, flush=True)


if __name__ == "__main__":
    main()
