"""Golden tests for losses vs torch implementations of the reference math
(reference src/utils/losses.py, immoco.py:170-172)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops import gradient_entropy, tv_loss, real_pair_mse


def torch_gradient_entropy(x):
    dx = (x[:, :-1] - x[:, 1:]).abs()
    dy = (x[:-1, :] - x[1:, :]).abs()
    dx = F.pad(dx, (0, 1, 0, 0))
    dy = F.pad(dy, (0, 0, 0, 1))
    g = dx + dy
    return -torch.sum(g * torch.log(g + 1e-24))


def test_gradient_entropy_complex(rng):
    x = (rng.standard_normal((12, 10)) + 1j * rng.standard_normal((12, 10))).astype(
        np.complex64
    )
    ours = float(gradient_entropy(jnp.asarray(x)))
    theirs = float(torch_gradient_entropy(torch.from_numpy(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_gradient_entropy_real(rng):
    x = np.abs(rng.standard_normal((9, 9))).astype(np.float32)
    ours = float(gradient_entropy(jnp.asarray(x)))
    theirs = float(torch_gradient_entropy(torch.from_numpy(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_tv_loss(rng):
    x = (rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))).astype(
        np.complex64
    )
    tx = torch.from_numpy(x)
    theirs = sum(
        torch.sum(torch.abs(p[:, :-1] - p[:, 1:]))
        + torch.sum(torch.abs(p[:-1, :] - p[1:, :]))
        for p in (tx.real, tx.imag)
    )
    ours = float(tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-4)


def test_real_pair_mse_matches_view_as_real(rng):
    a = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype(
        np.complex64
    )
    b = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype(
        np.complex64
    )
    theirs = float(
        F.mse_loss(
            torch.view_as_real(torch.from_numpy(a)),
            torch.view_as_real(torch.from_numpy(b)),
        )
    )
    ours = float(real_pair_mse(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_gradient_entropy_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((5, 5)).astype(np.float32)) ** 2 + 0.1
    g = jax.grad(gradient_entropy)(x)
    assert np.all(np.isfinite(np.asarray(g)))
