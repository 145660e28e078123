"""Probe: XLA TPU FFT vs centered-DFT-as-matmul for the movement k-space
terms of the IM-MoCo forward model.

The fit step computes fft2c over (M, H, W) complex per iteration (forward
AND backward).  A centered DFT is a fixed linear map, so both axes can be
evaluated as dense matmuls on the MXU with the shift permutations folded
into the matrices.  At 320^2 x M=12 that is ~6 GFLOP — potentially far
cheaper than XLA's TPU FFT lowering, and its autodiff is matmuls too.

Times R=20 reps inside one jitted lax.scan (amortizes the ~40 ms tunnel
dispatch), forward-only and value_and_grad, fp32 and bf16 matmuls.

Usage: python scripts/fft_bench.py [B M R]
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

from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.utils.hostio import sync

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
M = int(sys.argv[2]) if len(sys.argv) > 2 else 12
R = int(sys.argv[3]) if len(sys.argv) > 3 else 20
H = W = 320


def centered_dft_matrix(n: int) -> np.ndarray:
    """A with fft2c-over-one-axis(x) == A @ x (column convention)."""
    eye = np.eye(n, dtype=np.complex64)
    return np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(eye, axes=0), axis=0), axes=0
    ).astype(np.complex64)


A_h = centered_dft_matrix(H)
A_w = centered_dft_matrix(W)
# Threaded as jit arguments (statics discipline) as real pairs.
ARGS32 = tuple(
    jnp.asarray(a, jnp.float32)
    for a in (A_h.real, A_h.imag, A_w.real, A_w.imag)
)
ARGS16 = tuple(a.astype(jnp.bfloat16) for a in ARGS32)


def dft2c_mm(xre, xim, ahr, ahi, awr, awi, dtype):
    """fft2c via matmuls on real pairs; returns (yre, yim) fp32."""
    xre = xre.astype(dtype)
    xim = xim.astype(dtype)

    def mm(a, b):  # (..., H, W) @ (W, W') contraction on last axis
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # W axis: X @ A_w^T == contraction of last axis with A_w (A symmetric,
    # but keep explicit transpose for clarity).
    awr_t, awi_t = awr.T, awi.T
    yre = mm(xre, awr_t) - mm(xim, awi_t)
    yim = mm(xre, awi_t) + mm(xim, awr_t)
    # H axis: A_h @ Y — contract Y's -2 axis with A_h's axis 1.
    def mmL(mat, y):
        r = jax.lax.dot_general(
            y.astype(dtype), mat, (((y.ndim - 2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (..., W, H) with contracted axis appended last
        return jnp.moveaxis(r, -1, -2)

    zre = mmL(ahr, yre) - mmL(ahi, yim)
    zim = mmL(ahr, yim) + mmL(ahi, yre)
    return zre, zim


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.2f} ms/rep ({R} reps, compile {t_c:.1f}s)",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.standard_normal((B, M, H, W)), jnp.float32)
    xim = jnp.asarray(rng.standard_normal((B, M, H, W)), jnp.float32)

    def loop(body):
        def run(xre, xim, *mats):
            def step(c, _):
                r = body(c[0], c[1], *mats)
                return (c[0] + 1e-9 * r[0][..., :1, :1].mean(),
                        c[1]), r[0].sum() + r[1].sum()
            (_, _), s = jax.lax.scan(step, (xre, xim), None, length=R)
            return s.sum()
        return run

    def fft_body(xre, xim):
        y = fft2c(jax.lax.complex(xre, xim))
        return y.real, y.imag

    def mm_body32(xre, xim, *mats):
        return dft2c_mm(xre, xim, *mats, dtype=jnp.float32)

    def mm_body16(xre, xim, *mats):
        return dft2c_mm(xre, xim, *mats, dtype=jnp.bfloat16)

    # Correctness check first (single rep, small tolerance).
    y_ref = jax.jit(lambda a, b: fft_body(a, b))(xre[:1, :1], xim[:1, :1])
    y32 = jax.jit(lambda a, b, *m: mm_body32(a, b, *m))(
        xre[:1, :1], xim[:1, :1], *ARGS32)
    err = jax.jit(
        lambda a, b, c, d: jnp.max(jnp.abs(a - c)) + jnp.max(jnp.abs(b - d))
    )(y_ref[0], y_ref[1], y32[0], y32[1])
    print(f"fp32 matmul-DFT max abs err vs FFT: {float(err):.3e}", flush=True)

    timed("fft fwd", loop(fft_body), xre, xim)
    timed("dft_mm fp32 fwd", loop(mm_body32), xre, xim, *ARGS32)
    timed("dft_mm bf16 fwd", loop(mm_body16), xre, xim, *ARGS16)

    def grad_loop(body):
        def run(xre, xim, *mats):
            def loss(a, b):
                r = body(a, b, *mats)
                return (r[0] ** 2).sum() + (r[1] ** 2).sum()

            def step(c, _):
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(c[0], c[1])
                return (c[0] + 1e-12 * g[0], c[1] + 1e-12 * g[1]), l
            (_, _), s = jax.lax.scan(step, (xre, xim), None, length=R)
            return s.sum()
        return run

    timed("fft fwd+bwd", grad_loop(fft_body), xre, xim)
    timed("dft_mm fp32 fwd+bwd", grad_loop(mm_body32), xre, xim, *ARGS32)
    timed("dft_mm bf16 fwd+bwd", grad_loop(mm_body16), xre, xim, *ARGS16)


if __name__ == "__main__":
    main()
