"""Bisect which op inside the warp-kernel core crashes the remote Mosaic
backend (HTTP 500).  Run: python scripts/probe_pallas2.py"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, WY, WX = 512, 128, 128


def check(name, fn):
    try:
        ok, detail = fn()
        print(f"{name}: {'OK' if ok else 'FAIL'} {detail}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: EXC {type(e).__name__}: {str(e)[:160]}", flush=True)


def run1(kern, ins, out_shape):
    T = 2
    specs = []
    arrs = []
    for a in ins:
        arrs.append(jnp.broadcast_to(a[None], (T, *a.shape)))
        specs.append(
            pl.BlockSpec(
                (1, *a.shape), lambda i: (i,) + (0,) * a.ndim
            )
        )
    f = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, *out_shape), lambda i: (i,) + (0,) * len(out_shape)
        ),
        out_shape=jax.ShapeDtypeStruct((T, *out_shape), jnp.float32),
    )
    return jax.jit(f)(*arrs)


key = jax.random.PRNGKey(0)
gy2 = jax.random.uniform(key, (8, n), minval=-2.0, maxval=WY + 2)
w2 = jax.random.normal(key, (WY, WX)).astype(jnp.bfloat16)
ax2 = jax.random.normal(key, (n, WX)).astype(jnp.bfloat16)
ay2 = jax.random.normal(key, (n, WY)).astype(jnp.bfloat16)


def onehot_from_row(pos2d):
    pos = pos2d[0, :]  # (n,) from (8, n) block row
    p0 = jnp.floor(pos)
    t = (pos - p0).astype(jnp.bfloat16)
    idx = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], WY), 1)
    p0i = p0.astype(jnp.int32)[:, None]
    lo = (idx == p0i).astype(jnp.bfloat16)
    hi = (idx == p0i + 1).astype(jnp.bfloat16)
    return lo * (1.0 - t)[:, None] + hi * t[:, None]


def probe_onehot_only():
    def kern(gy_ref, o_ref):
        ay = onehot_from_row(gy_ref[0])
        o_ref[0] = jnp.sum(ay.astype(jnp.float32), axis=1)[None, :]

    out = run1(kern, [gy2], (1, n))
    s = float(jnp.sum(out))
    return abs(s) > 0, f"sum={s:.3f}"


def probe_dot_only():
    def kern(a_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            a_ref[0], w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = run1(kern, [ay2, w2], (n, WX))
    ref = ay2.astype(jnp.float32) @ w2.astype(jnp.float32)
    d = float(jnp.max(jnp.abs(out[0] - ref)))
    return d < 1.0, f"maxdiff={d:.3g}"


def probe_epilogue():
    def kern(r_ref, a_ref, o_ref):
        rows = r_ref[0].astype(jnp.float32)
        ax = a_ref[0].astype(jnp.float32)
        o_ref[0] = jnp.sum(rows * ax, axis=1)[None, :]

    out = run1(kern, [ax2, ax2], (1, n))
    ref = jnp.sum(ax2.astype(jnp.float32) ** 2, axis=1)
    d = float(jnp.max(jnp.abs(out[0, 0] - ref)))
    return d < 1.0, f"maxdiff={d:.3g}"


def probe_onehot_dot():
    def kern(gy_ref, w_ref, o_ref):
        ay = onehot_from_row(gy_ref[0])
        o_ref[0] = jax.lax.dot_general(
            ay, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = run1(kern, [gy2, w2], (n, WX))
    s = float(jnp.sum(jnp.abs(out)))
    return s > 0, f"sum={s:.3f}"


def probe_full_core():
    def kern(gy_ref, gx_ref, w_ref, o_ref):
        ay = onehot_from_row(gy_ref[0])
        ax = onehot_from_row(gx_ref[0])
        rows = jax.lax.dot_general(
            ay, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = jnp.sum(rows * ax.astype(jnp.float32), axis=1)[None, :]

    out = run1(kern, [gy2, gy2, w2], (1, n))
    s = float(jnp.sum(jnp.abs(out)))
    return s > 0, f"sum={s:.3f}"


def probe_smem_flag():
    K, M = 3, 4

    def kern(f_ref, x_ref, o_ref):
        @pl.when(f_ref[0, 0] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += x_ref[...]

    x = jnp.arange(K * M * 256, dtype=jnp.float32).reshape(K * M, 1, 256)
    flags = jnp.asarray(
        [[1 if i % M == 0 else 0] for i in range(K * M)], jnp.int32
    )
    f = pl.pallas_call(
        kern,
        grid=(K * M,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 256), lambda i: (i // M, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, 1, 256), jnp.float32),
    )
    out = jax.jit(f)(flags, x)
    ref = x.reshape(K, M, 256).sum(1).reshape(K, 1, 256)
    d = float(jnp.max(jnp.abs(out - ref)))
    return d == 0.0, f"maxdiff={d}"


def main():
    print("backend:", jax.default_backend(), flush=True)
    check("smem_flag", probe_smem_flag)
    check("dot_only", probe_dot_only)
    check("epilogue", probe_epilogue)
    check("onehot_only", probe_onehot_only)
    check("onehot_dot", probe_onehot_dot)
    check("full_core", probe_full_core)


if __name__ == "__main__":
    main()
