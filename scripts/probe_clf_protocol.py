"""Classifier-protocol x lesion-geometry grid for the condition-gap hunt
(VERDICT r1 #6; no IM-MoCo fits here — free/corrupted columns only).

Round-2-late findings this probe exists to navigate:
- trained-backbone ResNet saturates at 1.0 under EVERY condition even for
  faint cues (rigid ghosting is unitary: the cue is replicated, not
  destroyed, and a strong net learns the invariance);
- head-only on random features is chance;
- the honest middle is the reference's own protocol — FROZEN pretrained
  backbone + linear head (train_classification.py:29-158) — with the
  "distinct"-task backbone standing in for ImageNet.

For each (geometry, steps) this trains a transfer head on seed-0 patches
and reports held-out (seed-1000) accuracy on motion-free and
heavy-corrupted patches.  Good = free clearly above chance AND corrupted
clearly below free.

Usage: python scripts/probe_clf_protocol.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu import weights as W
from miccai24_immoco_tpu.data.lesions import lesion_corpus
from miccai24_immoco_tpu.eval.downstream import extract_patches
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.train.train_classification import (
    ClassifierTrainConfig,
    train_classifier,
)
from miccai24_immoco_tpu.utils.checkpoint import restore
from miccai24_immoco_tpu.utils.hostio import put_complex


def patches_of(corpus, n):
    out = []
    for i in range(n):
        img = jnp.abs(put_complex(corpus["image"][i]))
        p = extract_patches(img, jnp.asarray(corpus["centers"][i : i + 1]), 124)
        out.append(np.asarray(p[0]))
    return np.stack(out)


def corrupted_patches_of(corpus, n, lo=16, hi=19, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        img = put_complex(corpus["image"][i])
        sim = simulate_motion_2d(
            jax.random.PRNGKey(1000 + 2 * i + 1), img,
            n_movements=int(rng.integers(lo, hi + 1)),
        )
        p = extract_patches(
            jnp.abs(ifft2c(sim.kspace)),
            jnp.asarray(corpus["centers"][i : i + 1]), 124,
        )
        out.append(np.asarray(p[0]))
    return np.stack(out)


def main():
    n_train, n_eval = 256, 32
    full = bool(int(os.environ.get("PROBE_FULL_BACKBONE", "0")))
    backbone_init = None
    if not full:
        src = restore(W.path_of("classifier_synthetic"))
        backbone_init = {
            "params": {**src["backbone"], **src["head_params"]},
            "batch_stats": src["batch_stats"],
        }
    if os.environ.get("PROBE_GEOMS"):
        geoms = {}
        for spec in os.environ["PROBE_GEOMS"].split(";"):
            name, vals = spec.split("=")
            r, s, b, lo, hi = (float(v) for v in vals.split(","))
            geoms[name] = dict(ring_radius=r, ring_sigma=s, blob_sigma=b,
                               amp_lo=lo, amp_hi=hi)
    else:
        geoms = {
            "D (R2.5 a.22-.30)": dict(ring_radius=2.5, ring_sigma=0.9,
                                      blob_sigma=1.8, amp_lo=0.22,
                                      amp_hi=0.30),
            "G (R2.8 a.22-.30)": dict(ring_radius=2.8, ring_sigma=1.0,
                                      blob_sigma=2.0, amp_lo=0.22,
                                      amp_hi=0.30),
            "B (R3.0 a.25-.35)": dict(ring_radius=3.0, ring_sigma=1.0,
                                      blob_sigma=2.0, amp_lo=0.25,
                                      amp_hi=0.35),
            "A (R3.5 a.30-.40)": dict(ring_radius=3.5, ring_sigma=1.2,
                                      blob_sigma=2.2, amp_lo=0.30,
                                      amp_hi=0.40),
        }
    for name, g in geoms.items():
        tr = lesion_corpus(n_train, 320, 320, seed=0, variant="subtle",
                           subtle_geom=g)
        ev = lesion_corpus(n_eval, 320, 320, seed=1000, variant="subtle",
                           subtle_geom=g)
        ptr = patches_of(tr, n_train)
        pfree = patches_of(ev, n_eval)
        pcorr = corrupted_patches_of(ev, n_eval)
        cfg = ClassifierTrainConfig(steps=3000, train_backbone=full)
        state, eval_step = train_classifier(
            ptr, tr["labels"], cfg, val=(ptr[:64], tr["labels"][:64]),
            backbone_init=backbone_init,
        )
        hp = state["head_params"]
        acc_tr = float(eval_step(hp, jnp.asarray(ptr[:128]),
                                 jnp.asarray(tr["labels"][:128])))
        acc_free = float(eval_step(hp, jnp.asarray(pfree),
                                   jnp.asarray(ev["labels"])))
        acc_corr = float(eval_step(hp, jnp.asarray(pcorr),
                                   jnp.asarray(ev["labels"])))
        print(f"{name}: train={acc_tr:.3f} free={acc_free:.3f} "
              f"corrupted_heavy={acc_corr:.3f}", flush=True)


if __name__ == "__main__":
    main()
