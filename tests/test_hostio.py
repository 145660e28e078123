"""Host <-> device transfer helper tests."""

import numpy as np

import jax.numpy as jnp

from miccai24_immoco_tpu.utils.hostio import (
    get_complex,
    put_complex,
    readback,
    sync,
)


def test_put_get_roundtrip(rng):
    x = (rng.standard_normal((5, 7)) + 1j * rng.standard_normal((5, 7))).astype(
        np.complex64
    )
    dev = put_complex(x)
    assert dev.dtype == jnp.complex64
    back = get_complex(dev)
    np.testing.assert_allclose(back, x, atol=1e-6)
    assert back.dtype == np.complex64


def test_readback_and_sync(rng):
    x = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    np.testing.assert_allclose(readback(x), np.asarray(x))
    sync({"a": x, "b": None})  # must not raise
