"""Tune the subtle lesion corpus until motion corruption genuinely destroys
the class cue (VERDICT r1 #6: the reference's test_classification.py:65-100
shows accuracy DROP under corruption and RECOVER under correction; the
round-2 "subtle" ring-vs-blob geometry still classifies at 1.0 corrupted).

For each candidate geometry, measures the best-threshold accuracy of the
matched-template statistic <patch_center, ring_template - blob_template>
on (a) motion-free and (b) heavy-corrupted patches.  A good corpus has
proxy ~1.0 motion-free and near-chance corrupted (the ResNet can only be
worse-behaved than the matched filter under corruption, and better on
clean data).

Usage: JAX_PLATFORMS=cpu python scripts/probe_lesion_cue.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.data.lesions import SUBTLE_GEOM, lesion_phantom_np
from miccai24_immoco_tpu.eval.downstream import extract_patches
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.utils.hostio import put_complex


def template_stat(patch: np.ndarray, g: dict) -> float:
    p = np.abs(patch).astype(np.float64)
    h, w = p.shape
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    d2 = (yy - h / 2) ** 2 + (xx - w / 2) ** 2
    ring = np.exp(-((np.sqrt(d2) - g["ring_radius"]) ** 2) / g["ring_sigma"] ** 2)
    blob = np.exp(-d2 / g["blob_sigma"] ** 2)
    t = ring - blob
    win = d2 < (g["ring_radius"] + 3 * g["ring_sigma"] + 4) ** 2
    pw = p[win] - p[win].mean()
    return float((pw * t[win]).sum())


def best_threshold_acc(stats: np.ndarray, labels: np.ndarray) -> float:
    best = max(labels.mean(), 1 - labels.mean())
    for thr in stats:
        best = max(
            best,
            ((stats >= thr) == labels).mean(),
            ((stats < thr) == labels).mean(),
        )
    return float(best)


def run_geom(name: str, g: dict, n: int, size: int = 320):
    rng = np.random.default_rng(7)
    stats_free, stats_corr, labels = [], [], []
    for i in range(n):
        cls = i % 2
        ph, c = lesion_phantom_np(size, size, seed=1000 + i, cls=cls,
                                  variant="subtle", subtle_geom=g)
        labels.append(cls)
        img = put_complex(ph)
        cj = jnp.asarray(c[None])
        p_free = np.asarray(extract_patches(jnp.abs(img), cj, 124)[0])
        n_mov = int(rng.integers(16, 20))
        sim = simulate_motion_2d(
            jax.random.PRNGKey(1000 + 2 * i + 1), img, n_movements=n_mov
        )
        p_corr = np.asarray(
            extract_patches(jnp.abs(ifft2c(sim.kspace)), cj, 124)[0]
        )
        stats_free.append(template_stat(p_free, g))
        stats_corr.append(template_stat(p_corr, g))
    labels = np.asarray(labels)
    af = best_threshold_acc(np.asarray(stats_free), labels)
    ac = best_threshold_acc(np.asarray(stats_corr), labels)
    sf, sc = np.asarray(stats_free), np.asarray(stats_corr)
    gap_f = abs(sf[labels == 1].mean() - sf[labels == 0].mean()) / (
        sf.std() + 1e-9
    )
    gap_c = abs(sc[labels == 1].mean() - sc[labels == 0].mean()) / (
        sc.std() + 1e-9
    )
    print(f"{name}: free acc={af:.3f} (sep {gap_f:.2f})  "
          f"corrupted acc={ac:.3f} (sep {gap_c:.2f})", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    candidates = {
        "r2-shipped (R7 s1.8 b4.5 a.45-.6)": dict(SUBTLE_GEOM),
        "A (R3.5 s1.2 b2.2 a.30-.40)": dict(
            ring_radius=3.5, ring_sigma=1.2, blob_sigma=2.2,
            amp_lo=0.30, amp_hi=0.40),
        "B (R3.0 s1.0 b2.0 a.25-.35)": dict(
            ring_radius=3.0, ring_sigma=1.0, blob_sigma=2.0,
            amp_lo=0.25, amp_hi=0.35),
        "C (R4.0 s1.3 b2.6 a.35-.45)": dict(
            ring_radius=4.0, ring_sigma=1.3, blob_sigma=2.6,
            amp_lo=0.35, amp_hi=0.45),
        "D (R2.5 s0.9 b1.8 a.22-.30)": dict(
            ring_radius=2.5, ring_sigma=0.9, blob_sigma=1.8,
            amp_lo=0.22, amp_hi=0.30),
    }
    for name, g in candidates.items():
        run_geom(name, g, n)


if __name__ == "__main__":
    main()
