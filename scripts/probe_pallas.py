"""On-device probes for the Pallas patterns the tiled warp kernel needs.

Run: python scripts/probe_pallas.py
Each probe prints OK/FAIL; designed to be cheap (tiny shapes, one jit each).

Constraint discovered on this toolchain: the last two dims of every block
shape must be (mult of 8, mult of 128) or equal the full array dims; the
dense warp kernel's lane-splitting reshape (n, W*C) -> (n, W, C) crashes the
remote Mosaic backend (HTTP 500), so the tiled kernel uses per-channel 2-D
ops only.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, fn):
    try:
        ok, detail = fn()
        print(f"{name}: {'OK' if ok else 'FAIL'} {detail}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: EXC {type(e).__name__}: {str(e)[:200]}", flush=True)


def probe_onehot_dot():
    """The tiled kernel core: in-kernel one-hot + dot + epilogue reduction,
    per-channel 2-D ops only (no lane-splitting reshape)."""
    n, WY, WX = 512, 128, 128

    def kern(gy_ref, gx_ref, w_ref, o_ref):
        gy = gy_ref[0]  # (1, n)? -> gy_ref block (1, 8, n)
        del gy
        gyv = gy_ref[0, 0, :]  # (n,)
        gxv = gx_ref[0, 0, :]
        compute = jnp.bfloat16

        def one_hot(pos, size):
            p0 = jnp.floor(pos)
            t = (pos - p0).astype(compute)
            idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
            p0i = p0.astype(jnp.int32)[:, None]
            lo = (idx == p0i).astype(compute)
            hi = (idx == p0i + 1).astype(compute)
            return lo * (1.0 - t)[:, None] + hi * t[:, None]

        ay = one_hot(gyv, WY)  # (n, WY) bf16
        ax = one_hot(gxv, WX)
        acc = []
        for c in range(2):
            rows = jax.lax.dot_general(
                ay, w_ref[0, c],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n, WX) f32
            acc.append(jnp.sum(rows * ax.astype(jnp.float32), axis=1))
        o_ref[0, 0, :] = acc[0]
        o_ref[0, 1, :] = acc[1]

    T = 4
    key = jax.random.PRNGKey(1)
    gy = jax.random.uniform(key, (T, 1, n), minval=-2.0, maxval=WY + 2.0)
    gx = jax.random.uniform(key, (T, 1, n), minval=-2.0, maxval=WX + 2.0)
    w = jax.random.normal(key, (T, 2, WY, WX), jnp.float32).astype(jnp.bfloat16)

    f = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, WY, WX), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 2, n), jnp.float32),
    )
    out = jax.jit(f)(gy, gx, w)

    def ref_impl(gy, gx, w):
        def one(gyv, gxv, wv):
            y0 = jnp.floor(gyv).astype(jnp.int32)
            x0 = jnp.floor(gxv).astype(jnp.int32)
            ty = (gyv - y0).astype(jnp.bfloat16).astype(jnp.float32)
            tx = (gxv - x0).astype(jnp.bfloat16).astype(jnp.float32)
            wf = wv.astype(jnp.float32)

            def tap(yy, xx):
                valid = (yy >= 0) & (yy < WY) & (xx >= 0) & (xx < WX)
                yc = jnp.clip(yy, 0, WY - 1)
                xc = jnp.clip(xx, 0, WX - 1)
                return jnp.where(valid, wf[:, yc, xc], 0.0)

            return (
                tap(y0, x0) * (1 - ty) * (1 - tx)
                + tap(y0 + 1, x0) * ty * (1 - tx)
                + tap(y0, x0 + 1) * (1 - ty) * tx
                + tap(y0 + 1, x0 + 1) * ty * tx
            )

        return jax.vmap(
            lambda a, b, c: jax.vmap(one, in_axes=(0, 0, None))(a[0], b[0], c)
        )(gy, gx, w).transpose(0, 2, 1)

    ref = jax.jit(ref_impl)(gy, gx, w)
    d = float(jnp.max(jnp.abs(out - ref)))
    m = float(jnp.max(jnp.abs(ref)))
    return d < 3e-2 * max(m, 1.0), f"maxdiff={d:.4g} refmax={m:.4g}"


def probe_indexmap_mod():
    """index_map with modulo arithmetic selecting a shared operand block."""

    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = x_ref[...] + w_ref[...]

    T, K, n = 6, 3, 256
    x = jnp.arange(T * n, dtype=jnp.float32).reshape(T, 1, n)
    w = jnp.arange(K * n, dtype=jnp.float32).reshape(K, 1, n) * 100.0

    f = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i % K, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 1, n), jnp.float32),
    )
    out = jax.jit(f)(x, w)
    ref = x + jnp.tile(w, (2, 1, 1))
    d = float(jnp.max(jnp.abs(out - ref)))
    return d == 0.0, f"maxdiff={d}"


def probe_accum_revisit():
    """Output block shared by consecutive grid steps with flag-driven init
    (the backward d_window accumulation pattern)."""

    K, M, n = 3, 4, 256

    def kern(f_ref, x_ref, o_ref):
        @pl.when(f_ref[0] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += x_ref[...]

    x = jnp.arange(K * M * n, dtype=jnp.float32).reshape(K * M, 1, n)
    flags = jnp.asarray(
        [1 if i % M == 0 else 0 for i in range(K * M)], jnp.int32
    )

    f = pl.pallas_call(
        kern,
        grid=(K * M,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i // M, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, 1, n), jnp.float32),
    )
    out = jax.jit(f)(flags, x)
    ref = x.reshape(K, M, n).sum(1, keepdims=True).reshape(K, 1, n)
    d = float(jnp.max(jnp.abs(out - ref)))
    return d == 0.0, f"maxdiff={d}"


def probe_vmap():
    """vmap over a pallas_call with an index_map-mod operand."""

    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + w_ref[...]

    T, K, n = 4, 2, 256

    def call(x, w):
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, n), lambda i: (i % K, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 1, n), jnp.float32),
        )(x, w)

    B = 3
    x = jnp.arange(B * T * n, dtype=jnp.float32).reshape(B, T, 1, n)
    w = jnp.arange(B * K * n, dtype=jnp.float32).reshape(B, K, 1, n)
    out = jax.jit(jax.vmap(call))(x, w)
    ref = x * 2.0 + jnp.tile(w, (1, 2, 1, 1))
    d = float(jnp.max(jnp.abs(out - ref)))
    return d == 0.0, f"maxdiff={d}"


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    check("onehot_dot", probe_onehot_dot)
    check("indexmap_mod", probe_indexmap_mod)
    check("accum_revisit", probe_accum_revisit)
    check("vmap_pallas", probe_vmap)


if __name__ == "__main__":
    main()
