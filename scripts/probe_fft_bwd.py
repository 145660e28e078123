"""Round-5 probe: the 36 ms hides in the k-space chain's BACKWARD — where?

probe_warp_bwd2: warp vjp 2.2 ms, fwd k-space chain 2.1 ms, vjp k-space
chain 38.7 ms.  Candidates: FFT backward, fftshift backward (rolls),
mask-broadcast backward, complex arithmetic VJP on this axon backend.
All hoist-proof (carry = input pair).  Chains (loss = |.|^2 MSE):

  vjp_fft_c      — complex in-jit -> fft2c -> mask-sum -> loss (no warp)
  vjp_fft_nos    — same without the fftshifts (raw fftn)
  vjp_fft_nomask — fft2c -> loss directly (M kept, no mask-sum)
  vjp_fft_single — ONE fft2c of (H, W) per batch item (M folded out)
  vjp_roll_only  — shifts only, no fft
  vjp_fft_fwdfftonly — fwd fft, loss in k-space of the M stack

Usage: python scripts/probe_fft_bwd.py [R]
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

R = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B, M, H, W = 4, 8, 320, 320


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(jfn(*args))
    t = time.perf_counter() - t0
    print(f"{name}: {t/R*1000:.3f} ms/rep (compile {tc:.1f}s)", flush=True)


def scan_force(one, *extra):
    def run(pair, *extra):
        def step(c, _):
            v = jax.vmap(one)(c, *extra)
            return c * (1.0 + 1e-12), v.sum()

        _, s = jax.lax.scan(step, pair, None, length=R)
        return s.sum()

    return run


def main():
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.standard_normal((B, M, H, W, 2)), jnp.float32)
    pair1 = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    masks = jnp.asarray(
        rng.uniform(size=(B, M, 1, W)) < (1.0 / M), jnp.float32
    )
    ktgt = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)

    def loss_c(z):
        return jnp.sum(z.real**2 + z.imag**2)

    def chain_fft_c(p, m1, kt1):
        x = jax.lax.complex(p[..., 0], p[..., 1])  # (M, H, W)
        k = fft2c(x)
        kc = jnp.sum(k * m1.astype(k.dtype), axis=0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return loss_c(kc - kt)

    def chain_fft_nos(p, m1, kt1):
        x = jax.lax.complex(p[..., 0], p[..., 1])
        k = jnp.fft.fftn(x, axes=(-2, -1))
        kc = jnp.sum(k * m1.astype(k.dtype), axis=0)
        kt = jax.lax.complex(kt1[..., 0], kt1[..., 1])
        return loss_c(kc - kt)

    def chain_fft_nomask(p):
        x = jax.lax.complex(p[..., 0], p[..., 1])
        k = fft2c(x)
        return loss_c(k)

    def chain_fft_single(p):
        x = jax.lax.complex(p[..., 0], p[..., 1])  # (H, W)
        k = fft2c(x)
        return loss_c(k)

    def chain_roll(p):
        x = jax.lax.complex(p[..., 0], p[..., 1])
        k = jnp.fft.fftshift(jnp.fft.ifftshift(x, axes=(-2, -1)),
                             axes=(-2, -1))
        return loss_c(k * (1.0 + 0.1j))

    cases = [
        ("fwd_fft_c   ", chain_fft_c, (masks, ktgt), pair, False),
        ("vjp_fft_c   ", chain_fft_c, (masks, ktgt), pair, True),
        ("vjp_fft_nos ", chain_fft_nos, (masks, ktgt), pair, True),
        ("vjp_fft_nomask", chain_fft_nomask, (), pair, True),
        ("vjp_fft_single", chain_fft_single, (), pair1, True),
        ("vjp_roll    ", chain_roll, (), pair, True),
    ]
    for name, chain, extra, inp, grad in cases:
        if grad:
            def one(p, *e, _c=chain):
                l, g = jax.value_and_grad(_c)(p, *e)
                return l + g.sum()
        else:
            def one(p, *e, _c=chain):
                return _c(p, *e)
        timed(name, scan_force(one, *extra), inp, *extra)


if __name__ == "__main__":
    main()
