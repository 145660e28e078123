"""Calibrate the attached TPU's effective HBM bandwidth and MXU throughput.

Anchors every perf decision: a scan of R big copies (bandwidth) and R big
matmuls (FLOPs), each with full data dependence through the carry so XLA can
neither hoist nor dead-code-eliminate the body (lessons from earlier probes:
bodies that only feed a scalar readback get DCE'd to nothing).

Usage: python scripts/calibrate_device.py
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

from miccai24_immoco_tpu.utils.hostio import sync

R = 20


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = (time.perf_counter() - t0) / R
    return t, tc


def main():
    rng = np.random.default_rng(0)

    # --- HBM bandwidth: y = x * c, 128 MB fp32 in + 128 MB out per rep.
    nbytes = 128 * 1024 * 1024
    x = jnp.asarray(rng.standard_normal(nbytes // 4), jnp.float32)

    def copy_loop(x):
        def step(c, _):
            y = c * 1.000001 + 1e-9
            return y, y[::65536].sum()

        c, s = jax.lax.scan(step, x, None, length=R)
        return c[:3].sum() + s.sum()

    t, tc = timed("copy", copy_loop, x)
    bw = 2 * nbytes / t / 1e9
    print(f"copy 128MB: {t*1000:.2f} ms/rep -> {bw:.0f} GB/s eff "
          f"(compile {tc:.1f}s)", flush=True)

    # --- elementwise chain (VPU): 10 fused multiply-adds on 128 MB.
    def vpu_loop(x):
        def step(c, _):
            y = c
            for _i in range(10):
                y = y * 1.0000001 + 1e-9
            return y, y[::65536].sum()

        c, s = jax.lax.scan(step, x, None, length=R)
        return c[:3].sum() + s.sum()

    t, tc = timed("vpu", vpu_loop, x)
    print(f"fma-chain x10 on 128MB: {t*1000:.2f} ms/rep "
          f"({10 * (nbytes // 4) * 2 / t / 1e12:.2f} Tops/s eff, "
          f"compile {tc:.1f}s)", flush=True)

    # --- MXU: (4096, 4096) @ (4096, 4096) bf16, carry-dependent.
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    def mm_loop(a, b):
        def step(c, _):
            y = jax.lax.dot_general(
                c, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            # renormalize to avoid overflow, keep full dependence
            y = y * (1.0 / 64.0)
            return y, y[::997, ::997].sum()

        c, s = jax.lax.scan(step, a, None, length=R)
        return c[:2, :2].sum() + s.sum()

    t, tc = timed("mxu", mm_loop, a, b)
    fl = 2 * 4096**3 / t / 1e12
    print(f"bf16 4096^3 matmul: {t*1000:.2f} ms/rep -> {fl:.0f} TFLOP/s eff "
          f"(compile {tc:.1f}s)", flush=True)

    # --- the fit's actual one-hot build, full consumption.
    n, h = 320 * 320, 320
    gy = jnp.asarray(rng.uniform(0, h - 1, (n,)), jnp.float32)

    def onehot_loop(gy):
        def step(c, _):
            p0 = jnp.floor(c)
            tt = (c - p0).astype(jnp.bfloat16)
            idx = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
            p0i = p0.astype(jnp.int32)[:, None]
            ay = (idx == p0i).astype(jnp.bfloat16) * (1.0 - tt)[:, None] + (
                idx == p0i + 1
            ).astype(jnp.bfloat16) * tt[:, None]
            return c + ay.sum() * 1e-12, ay.astype(jnp.float32).sum()

        c, s = jax.lax.scan(step, gy, None, length=R)
        return c[:3].sum() + s.sum()

    t, tc = timed("onehot", onehot_loop, gy)
    print(f"one-hot build (102400x320 bf16): {t*1000:.2f} ms/rep "
          f"(compile {tc:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
