"""Probe the hat-function (relu(1-|iota-pos|)) one-hot formulation in Mosaic.

Run: python scripts/probe_pallas3.py"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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
            pl.BlockSpec((1, *a.shape), lambda i: (i,) + (0,) * a.ndim)
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
gx2 = jax.random.uniform(
    jax.random.PRNGKey(1), (8, n), minval=-2.0, maxval=WX + 2
)
w2 = jax.random.normal(key, (2, WY, WX)).astype(jnp.bfloat16)


def hat(pos_row, size):
    """pos_row: (1, n) -> (n, size) bilinear weight rows."""
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (pos_row.shape[1], size), 1
    ).astype(jnp.float32)
    pos = pos_row[0, :][:, None]  # (n, 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos)).astype(jnp.bfloat16)


def probe_hat_only():
    def kern(gy_ref, o_ref):
        ay = hat(gy_ref[0], WY)
        o_ref[0] = jnp.sum(ay.astype(jnp.float32), axis=1)[None, :]

    out = run1(kern, [gy2], (1, n))
    # every in-range point's weights sum to 1
    inr = (gy2[0] >= 0) & (gy2[0] <= WY - 1)
    d = float(jnp.max(jnp.abs(jnp.where(inr, out[0, 0] - 1.0, 0.0))))
    return d < 1e-2, f"maxdev_from_1={d:.3g}"


def probe_hat_full_core():
    def kern(gy_ref, gx_ref, w_ref, o_ref):
        ay = hat(gy_ref[0], WY)
        ax = hat(gx_ref[0], WX)
        for c in range(2):
            rows = jax.lax.dot_general(
                ay, w_ref[0, c],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, c] = jnp.sum(rows * ax.astype(jnp.float32), axis=1)

    T = 2
    f = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, WY, WX), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 2, n), jnp.float32),
    )
    gy = jnp.broadcast_to(gy2[None], (T, 8, n))
    gx = jnp.broadcast_to(gx2[None], (T, 8, n))
    w = jnp.broadcast_to(w2[None], (T, 2, WY, WX))
    out = jax.jit(f)(gy, gx, w)

    # XLA reference with the same hat formulation
    def ref(gyv, gxv, wv):
        idxy = jnp.arange(WY, dtype=jnp.float32)
        idxx = jnp.arange(WX, dtype=jnp.float32)
        ay = jnp.maximum(0, 1 - jnp.abs(idxy[None] - gyv[:, None])).astype(
            jnp.bfloat16
        )
        ax = jnp.maximum(0, 1 - jnp.abs(idxx[None] - gxv[:, None])).astype(
            jnp.bfloat16
        )
        rows = jnp.einsum(
            "ny,cyx->ncx", ay, wv, preferred_element_type=jnp.float32
        )
        return jnp.einsum(
            "ncx,nx->nc", rows, ax.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).T

    r = jax.jit(ref)(gy2[0], gx2[0], w2)
    d = float(jnp.max(jnp.abs(out[0] - r)))
    m = float(jnp.max(jnp.abs(r)))
    return d <= 3e-2 * max(m, 1.0), f"maxdiff={d:.4g} refmax={m:.4g}"


def main():
    print("backend:", jax.default_backend(), flush=True)
    check("hat_only", probe_hat_only)
    check("hat_full_core", probe_hat_full_core)


if __name__ == "__main__":
    main()
