"""True motion-parameter dump for heavy-corpus slices.

Regenerates the seed-2024 heavy corpus' motion draws (same PRNG stream as
cli._synthetic_corpus — must run on the same backend the corpus was built
on, see CLAUDE.md PRNG landmine) and reports, per slice: each movement's
(rotation deg, shift px) and the implied MAX |displacement| over the image
raster — to test whether the failing slices' true motion exceeds the
protocol's motion_disp_px=30 tanh cap (models/immoco.py), which would make
the true solution inexpressible by the capped Motion INR.

Usage: python scripts/probe_true_motion.py [idx,...] [n_corpus]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch


def main():
    idxs = [
        int(i)
        for i in (sys.argv[1] if len(sys.argv) > 1 else "1,11,16").split(",")
    ]
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    size, seed, n_mov = 320, 2024, 18

    images = phantom_stack(n_corpus, size, size, seed=seed)
    sims = simulate_motion_batch(
        jax.random.PRNGKey(seed), images, n_movements=n_mov, max_movements=24
    )
    rot = np.asarray(sims.rotations)  # (N, 24) deg
    tra = np.asarray(sims.translations)  # (N, 24, 2) px

    # Max |displacement| of the rigid transform over the raster corners.
    h = w = size
    corners = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [-w / 2, h / 2], [w / 2, h / 2]]
    )

    for i in idxs:
        print(f"\nslice {i}: mov | rot_deg | shift_px | max_disp_px")
        worst = 0.0
        for m in range(n_mov):
            th = np.deg2rad(rot[i, m])
            R = np.array(
                [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
            )
            d = (corners @ R.T + tra[i, m][None]) - corners
            md = float(np.abs(np.linalg.norm(d, axis=1)).max())
            worst = max(worst, md)
            print(
                f"  {m:2d} | {rot[i, m]:7.2f} | ({tra[i, m][0]:5.1f},"
                f" {tra[i, m][1]:5.1f}) | {md:8.2f}"
            )
        print(f"  worst-case displacement: {worst:.2f} px "
              f"(cap 30 {'EXCEEDED' if worst > 30 else 'ok'})")


if __name__ == "__main__":
    main()
