"""Host <-> device transfer helpers for complex data.

TPUs have no native complex dtype — XLA decomposes complex arithmetic into
real pairs internally — and on some TPU runtimes (including the experimental
one this framework targets) complex64 buffers cannot cross the host<->device
boundary at all: host-transferred complex buffers fail at first use and
device complex buffers fail on readback, while jit-*produced* complex arrays
work fine as inputs/outputs of further jitted computations.

Convention used throughout this framework:

- Complex data ENTERS the device as stacked (..., 2) float32 ("real pairs")
  and is combined with ``lax.complex`` inside a jitted computation
  (``put_complex``).
- Complex data LEAVES the device as two float32 transfers (``get_complex``).
- Between jitted stages, complex arrays flow freely on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _combine(pair: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(pair[..., 0], pair[..., 1])


@jax.jit
def _split(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def put_complex(array) -> jnp.ndarray:
    """Host complex array -> device complex64 (safe on all runtimes)."""
    a = np.asarray(array)
    pair = np.stack([a.real, a.imag], axis=-1).astype(np.float32)
    return _combine(jnp.asarray(pair))


def get_complex(x: jnp.ndarray) -> np.ndarray:
    """Device complex array -> host numpy complex64."""
    pair = np.asarray(_split(x))
    return (pair[..., 0] + 1j * pair[..., 1]).astype(np.complex64)


def put_real(array) -> jnp.ndarray:
    return jnp.asarray(np.asarray(array, dtype=np.float32))


def readback(x: jnp.ndarray) -> np.ndarray:
    """Device -> host for small arrays, robust to runtimes whose raw buffer
    transfer path is unimplemented for some layouts: falls back to per-
    element scalar reads through a jitted gather."""
    try:
        return np.asarray(x)
    except Exception:
        flat = x.reshape(-1)
        take = jax.jit(lambda a, i: a[i])
        vals = [float(take(flat, i)) for i in range(flat.shape[0])]
        return np.asarray(vals, dtype=np.float32).reshape(x.shape)


def sync(x) -> None:
    """Force execution of x's producers (block_until_ready does not
    synchronize on tunneled runtimes): reduce to a scalar and read it."""
    leaves = jax.tree.leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            val = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))(
                leaf
            )
            float(val)
            return
