"""NUFFT golden tests against the reference pytorch implementation (imported
read-only from /root/reference as a test oracle), plus Autofocusing / AF+
smoke tests."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import AFPlusConfig, AutofocusingConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.af_plus import make_afplus_fit, rotate_kspace
from miccai24_immoco_tpu.models.autofocusing import (
    autofocus_forward,
    make_autofocus_fit,
)
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.ops.nufft import nufft2, nufft_adjoint, ugly_number

REF = "/root/reference/src"
HAVE_REF = os.path.isdir(REF)


def _ref_nufft():
    sys.path.insert(0, REF)
    from utils.pytorch_nufft import nufft as ref_nufft  # noqa

    return ref_nufft


def test_ugly_numbers():
    assert ugly_number(320 * 1.25) == 400
    assert ugly_number(320 * 5) == 1600
    assert ugly_number(7) == 8
    assert ugly_number(1) == 1


@pytest.mark.skipif(not HAVE_REF, reason="reference mount unavailable")
def test_nufft_type2_matches_reference(rng):
    import torch

    ref = _ref_nufft()
    h = w = 32
    img = (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))).astype(
        np.complex64
    )
    # Well-separated coords (no same-cell collisions) so the reference's
    # assign-vs-accumulate gridding quirk cannot bite in the adjoint test.
    coord = (rng.uniform(-h // 2 + 2, h // 2 - 2, size=(40, 2))).astype(np.float32)

    ours = np.asarray(nufft2(jnp.asarray(img), jnp.asarray(coord)))
    theirs = (
        ref.nufft(
            torch.from_numpy(img)[None, None],
            torch.from_numpy(coord),
            device="cpu",
        )
        .numpy()
        .squeeze()
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference mount unavailable")
def test_nufft_adjoint_matches_reference_sparse(rng):
    import torch

    ref = _ref_nufft()
    h = w = 32
    npts = 20
    # Coordinates far apart (> kernel width) so reference gridding has no
    # collisions and equals true scatter-add.
    ys, xs = np.meshgrid(np.arange(-12, 12, 6), np.arange(-12, 12, 6), indexing="ij")
    coord = np.stack([ys.ravel(), xs.ravel()], -1).astype(np.float32)
    coord += rng.uniform(-0.4, 0.4, coord.shape).astype(np.float32)
    vals = (
        rng.standard_normal(coord.shape[0]) + 1j * rng.standard_normal(coord.shape[0])
    ).astype(np.complex64)

    ours = np.asarray(nufft_adjoint(jnp.asarray(vals), jnp.asarray(coord), (h, w)))
    theirs = (
        ref.nufft_adjoint(
            torch.from_numpy(vals),
            torch.from_numpy(coord),
            out_shape=[1, 1, h, w],
            device="cpu",
        )
        .numpy()
        .squeeze()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_rotate_kspace_identity_is_scaled_noop(rng):
    """Zero rotation reproduces the image up to the reference NUFFT's global
    scale convention (prod(os_shape)/sqrt(prod(out)) etc., nufft.py:66-68 —
    AF+ trains its metric net at this scale, so we keep it bit-compatible
    rather than 'fixing' it)."""
    img = phantom_stack(1, 32, 32, seed=7)[0]
    ks = fft2c(img)
    out = rotate_kspace(ks, jnp.zeros((32,)), oversamp=5)
    a = np.asarray(jnp.abs(ifft2c(out)))
    b = np.asarray(jnp.abs(img))
    scale = (a * b).sum() / (b * b).sum()
    assert scale > 1.0  # the convention upscales
    assert np.abs(a - scale * b).max() / (scale * b.max()) < 0.05


def test_autofocus_fit_runs_and_reduces_loss():
    img = phantom_stack(1, 48, 48, seed=9)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(1), img, n_movements=2)
    masks, n = extract_movement_groups(sim.mask[0], 48, 4)
    fit = jax.jit(make_autofocus_fit(AutofocusingConfig(iters=15)))
    r = fit(sim.kspace, masks)
    assert np.isfinite(np.asarray(r.losses)).all()
    assert r.image.shape == (48, 48)
    # GE loss should not increase overall.
    assert float(r.losses[-1]) <= float(r.losses[0]) * 1.001


def test_autofocus_zero_params_identity():
    img = phantom_stack(1, 32, 32, seed=3)[0]
    ks = fft2c(img)
    masks = jnp.zeros((3, 32, 32)).at[0, :, 4:8].set(1.0)
    params = {
        "rot": jnp.zeros((3,)),
        "x_shifts": jnp.zeros((3,)),
        "y_shifts": jnp.zeros((3,)),
    }
    out = autofocus_forward(params, ks, masks)
    # Unmasked columns pass through exactly.
    np.testing.assert_allclose(
        np.asarray(out[:, 8:].real), np.asarray(ks[:, 8:].real), atol=1e-4
    )


def test_afplus_fit_smoke():
    img = phantom_stack(1, 32, 32, seed=11)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(2), img, n_movements=2)

    # Stand-in metric: plain magnitude (sigmoid of zeros), enough to verify
    # the optimization loop machinery end-to-end.
    fit = jax.jit(make_afplus_fit(lambda x: jnp.zeros_like(x), AFPlusConfig(iters=3)))
    r = fit(sim.kspace)
    assert r.image.shape == (32, 32)
    assert np.isfinite(np.asarray(r.losses)).all()


def test_afplus_fit_params_arg_matches_closure():
    """make_afplus_fit_p (params as a traced jit argument — the statics
    discipline required for real checkpoints on the remote-compile runtime)
    is bit-identical to the closure-capture path."""
    from miccai24_immoco_tpu.models.af_plus import make_afplus_fit_p

    img = phantom_stack(1, 32, 32, seed=11)[0]
    sim = simulate_motion_2d(jax.random.PRNGKey(2), img, n_movements=2)
    cfg = AFPlusConfig(iters=3)
    scale = jnp.float32(0.7)  # a real "parameter" shaping the metric

    r_closure = jax.jit(make_afplus_fit(lambda x: scale * x, cfg))(sim.kspace)
    fit_p = jax.jit(make_afplus_fit_p(lambda p, x: p * x, cfg))
    r_param = fit_p(sim.kspace, scale)
    np.testing.assert_array_equal(
        np.asarray(r_closure.losses), np.asarray(r_param.losses)
    )
    np.testing.assert_array_equal(
        np.asarray(r_closure.image), np.asarray(r_param.image)
    )


def test_nufft_matmul_mode_matches_scatter(rng):
    from miccai24_immoco_tpu.ops.nufft import nufft2, nufft_adjoint

    h = w = 24
    img = jnp.asarray(
        (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w)))
        .astype(np.complex64)
    )
    npts = 200
    coord = jnp.asarray(
        rng.uniform(-h / 2, h / 2 - 1, (npts, 2)).astype(np.float32)
    )
    a = nufft2(img, coord, mode="scatter")
    b = nufft2(img, coord, mode="matmul")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)

    vals = jnp.asarray(
        (rng.standard_normal(npts) + 1j * rng.standard_normal(npts))
        .astype(np.complex64)
    )
    ga = nufft_adjoint(vals, coord, (h, w), mode="scatter")
    gb = nufft_adjoint(vals, coord, (h, w), mode="matmul")
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-4, atol=1e-5)

    # Gradient parity through the adjoint (the AF+ training path).
    def loss(v, mode):
        out = nufft_adjoint(v, coord, (h, w), mode=mode)
        return jnp.sum(jnp.abs(out) ** 2)

    g_s = jax.grad(lambda v: loss(v, "scatter"))(vals)
    g_m = jax.grad(lambda v: loss(v, "matmul"))(vals)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_s),
                               rtol=1e-4, atol=1e-5)


def test_nufft_adjoint_chunked_matches_unchunked():
    """Chunked matmul gridding (peak-memory control for AF+ training) must
    reproduce the unchunked matmul path exactly."""
    import jax

    rng = np.random.default_rng(3)
    npts = 64 * 64
    values = jnp.asarray(
        (rng.standard_normal(npts) + 1j * rng.standard_normal(npts)).astype(
            np.complex64
        )
    )
    coord = jnp.asarray(
        rng.uniform(-30, 30, (npts, 2)).astype(np.float32)
    )
    a = nufft_adjoint(values, coord, (64, 64), oversamp=5, mode="matmul")
    b = nufft_adjoint(
        values, coord, (64, 64), oversamp=5, mode="matmul", chunk=512
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
    )
    # Non-divisible chunk sizes are zero-padded, NOT silently unchunked
    # (ADVICE round 1): same result, chunking preserved for any npts.
    c = nufft_adjoint(
        values, coord, (64, 64), oversamp=5, mode="matmul", chunk=500
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4
    )
