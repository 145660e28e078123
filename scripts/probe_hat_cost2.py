"""Round-5 probe (v2, hoist-proof): cost of in-kernel hat construction.

probe_hat_cost.py v1 closed over loop-invariant operands, so XLA hoisted
the pallas_call out of the timing scan (CLAUDE.md landmine 10) — its
1.45 ms/rep readings were a single execution amortized over R.  Here the
coordinate operand is the scan CARRY (perturbed each iteration), so every
rep really executes.  probe_grid_layout.py already gave the honest
full-kernel number: ~13.4 ms/rep at 800 steps for hats+matmuls vs 1.2 for
matmuls alone => the two (n, win) hat builds cost ~15 us/step combined.
Variants isolate which part (iota? broadcast-sub? casts? count):

  mm_only      — no hats (known ~1.2)
  hat1         — ONE iota-hat + 2ch mm
  hat2         — TWO iota-hats + 2ch mm (production fwd shape)
  hat4         — FOUR iota-hats (production bwd shape) + 2ch mm
  ophat2       — two hats from an f32 iota-row OPERAND (no in-kernel iota)
  hatonly2     — two hats, no matmul (pure hat cost)

Usage: python scripts/probe_hat_cost2.py [R]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from miccai24_immoco_tpu.utils.hostio import sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
STEPS, N, WIN, C = 800, 4096, 96, 2


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def iota_hat(pos):
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, WIN), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[:, None])).astype(
        jnp.bfloat16
    )


def op_hat(pos, idx):
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[:, None])).astype(
        jnp.bfloat16
    )


def make_kern(n_hats, matmul, op_idx):
    def kern(*refs):
        if op_idx:
            idx_ref, gy_ref, gx_ref, w_ref, o_ref = refs
            idx = idx_ref[...]
            hats = [op_hat((gy_ref, gx_ref)[i % 2][0, 0], idx)
                    for i in range(n_hats)]
        else:
            gy_ref, gx_ref, w_ref, o_ref = refs
            hats = [iota_hat((gy_ref, gx_ref)[i % 2][0, 0])
                    for i in range(n_hats)]
        ay = hats[0]
        ax = hats[1 % len(hats)]
        extra = sum(
            jnp.sum(h, axis=1, dtype=jnp.float32) for h in hats[2:]
        ) if n_hats > 2 else 0.0
        for ci in range(C):
            if matmul:
                rows = jax.lax.dot_general(
                    ay, w_ref[0, ci],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                o_ref[0, ci] = (
                    jnp.sum(rows * ax, axis=1, dtype=jnp.float32) + extra
                )
            else:
                o_ref[0, ci] = (
                    jnp.sum(ay, axis=1, dtype=jnp.float32)
                    + jnp.sum(ax, axis=1, dtype=jnp.float32) + extra
                )

    return kern


def bench(name, n_hats, matmul, op_idx, gy, gx, w, idx):
    g_spec = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0))
    w_spec = pl.BlockSpec((1, C, WIN, WIN), lambda i: (i, 0, 0, 0))
    i_spec = pl.BlockSpec((1, WIN), lambda i: (0, 0))
    kern = make_kern(n_hats, matmul, op_idx)

    def one(gy):
        ins = (idx, gy, gx, w) if op_idx else (gy, gx, w)
        specs = ([i_spec] if op_idx else []) + [g_spec, g_spec, w_spec]
        return pl.pallas_call(
            kern, grid=(STEPS,), in_specs=specs,
            out_specs=pl.BlockSpec((1, C, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((STEPS, C, N), jnp.float32),
        )(*ins)

    def run(gy):
        def step(c, _):
            v = one(c)
            return c * (1.0 + 1e-12), v.sum()

        _, s = jax.lax.scan(step, gy, None, length=R)
        return s.sum()

    timed(name, run, gy)


def main():
    rng = np.random.default_rng(0)
    gy = jnp.asarray(rng.uniform(0, WIN - 1, (STEPS, 1, N)), jnp.float32)
    gx = jnp.asarray(rng.uniform(0, WIN - 1, (STEPS, 1, N)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((STEPS, C, WIN, WIN)), jnp.bfloat16)
    idx = jnp.arange(WIN, dtype=jnp.float32)[None]

    bench("mm_only ", 2, True, False, gy, gx, w, idx)  # hats unused? no —
    # mm_only needs hats as matmul input; measure with hats replaced by a
    # streamed operand instead: skip, probe_step_overhead covers it.
    bench("hat2_mm ", 2, True, False, gy, gx, w, idx)
    bench("hat1_mm ", 1, True, False, gy, gx, w, idx)
    bench("hat4_mm ", 4, True, False, gy, gx, w, idx)
    bench("ophat2  ", 2, True, True, gy, gx, w, idx)
    bench("hatonly2", 2, False, False, gy, gx, w, idx)


if __name__ == "__main__":
    main()
