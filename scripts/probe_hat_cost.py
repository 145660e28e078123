"""Round-5 probe: where do the fused warp kernel's ~19 us/step actually go?

probe_step_overhead.py showed the warp-shaped matmul at 1.5 us/step and a
null kernel at 1.6 us/step — per-step overhead and MXU work are NOT the
floor.  Remaining suspect: the in-kernel hat construction
(broadcasted_iota int32 -> f32 cast -> abs/max over (n, win)), whose cost
would scale with total ROWS (B*M*H*W), invariant to tile/win geometry —
exactly matching round-4's "flat" probes.  Variants measured here, all at
grid=(800,) n=4096 win=96 (the fit's step geometry):

  matmul       — dot only (baseline from probe_step_overhead)
  iota_hat     — full _hat (iota + cast + abs + max), value written
  op_iota_hat  — hat built from an OPERAND iota row broadcast against pos
  hat_mm       — current fwd kernel shape: 2 hats + per-channel mm + reduce
  ophat_mm     — same but hats from operand iota

Usage: python scripts/probe_hat_cost.py [R]
"""

import os
import sys
import time
import functools

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


def _hat_iota(pos, size):
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1).astype(
        jnp.float32
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos[:, None])).astype(
        jnp.bfloat16
    )


def _hat_op(pos, idx_row):
    # idx_row: (1, size) f32 operand; broadcast against (n, 1) pos.
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx_row - pos[:, None])).astype(
        jnp.bfloat16
    )


def k_iota_hat(gy_ref, gx_ref, o_ref):
    ay = _hat_iota(gy_ref[0, 0], WIN)
    ax = _hat_iota(gx_ref[0, 0], WIN)
    o_ref[0, 0] = (
        jnp.sum(ay, axis=1, dtype=jnp.float32)
        + jnp.sum(ax, axis=1, dtype=jnp.float32)
    )


def k_op_iota_hat(idx_ref, gy_ref, gx_ref, o_ref):
    idx = idx_ref[...]  # (1, WIN)
    ay = _hat_op(gy_ref[0, 0], idx)
    ax = _hat_op(gx_ref[0, 0], idx)
    o_ref[0, 0] = (
        jnp.sum(ay, axis=1, dtype=jnp.float32)
        + jnp.sum(ax, axis=1, dtype=jnp.float32)
    )


def k_hat_mm(gy_ref, gx_ref, w_ref, o_ref, *, op_idx=None):
    if op_idx is None:
        ay = _hat_iota(gy_ref[0, 0], WIN)
        ax = _hat_iota(gx_ref[0, 0], WIN)
    else:
        idx = op_idx[...]
        ay = _hat_op(gy_ref[0, 0], idx)
        ax = _hat_op(gx_ref[0, 0], idx)
    for ci in range(C):
        rows = jax.lax.dot_general(
            ay, w_ref[0, ci],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        o_ref[0, ci] = jnp.sum(rows * ax, axis=1, dtype=jnp.float32)


def k_ophat_mm(idx_ref, gy_ref, gx_ref, w_ref, o_ref):
    k_hat_mm(gy_ref, gx_ref, w_ref, o_ref, op_idx=idx_ref)


def scan_wrap(one, *xs):
    def run(*xs):
        def step(c, _):
            v = one(*xs)
            return c, v.sum()

        _, s = jax.lax.scan(step, 0.0, None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    gy = jnp.asarray(rng.uniform(0, WIN - 1, (STEPS, 1, N)), jnp.float32)
    gx = jnp.asarray(rng.uniform(0, WIN - 1, (STEPS, 1, N)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((STEPS, C, WIN, WIN)), jnp.bfloat16
    )
    idx = jnp.arange(WIN, dtype=jnp.float32)[None]  # (1, WIN)

    g_spec = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0))
    w_spec = pl.BlockSpec((1, C, WIN, WIN), lambda i: (i, 0, 0, 0))
    i_spec = pl.BlockSpec((1, WIN), lambda i: (0, 0))
    o1 = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0))
    oc = pl.BlockSpec((1, C, N), lambda i: (i, 0, 0))

    def call(kern, ins, specs, oshape, ospec):
        return pl.pallas_call(
            kern, grid=(STEPS,), in_specs=specs, out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        )(*ins)

    cases = [
        ("iota_hat   ", k_iota_hat, (gy, gx), [g_spec, g_spec],
         (STEPS, 1, N), o1),
        ("op_iota_hat", k_op_iota_hat, (idx, gy, gx),
         [i_spec, g_spec, g_spec], (STEPS, 1, N), o1),
        ("hat_mm     ", functools.partial(k_hat_mm), (gy, gx, w),
         [g_spec, g_spec, w_spec], (STEPS, C, N), oc),
        ("ophat_mm   ", k_ophat_mm, (idx, gy, gx, w),
         [i_spec, g_spec, g_spec, w_spec], (STEPS, C, N), oc),
    ]
    for name, kern, ins, specs, oshape, ospec in cases:
        try:
            one = lambda *a: call(kern, a, specs, oshape, ospec)
            timed(name, scan_wrap(one), *ins)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
