"""Identity-column recentering (ops/recenter.py): shift estimation and
correction round-trips on synthetic data.

The scenario mirrors the measured failing-heavy mechanism: the "fit"
produced a shifted copy of the anatomy; the measured k-space carries the
true anatomy on identity columns; recentering must recover alignment
from those columns alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.recenter import (
    apply_shift,
    estimate_shift,
    recenter_to_identity,
)


def _smooth_complex_image(key, h, w):
    """Band-limited random complex image (sharp enough to correlate,
    smooth enough that circular-shift wraparound is mild)."""
    k1, k2 = jax.random.split(key)
    x = jax.lax.complex(
        jax.random.normal(k1, (h, w)), jax.random.normal(k2, (h, w))
    )
    yy = jnp.abs(jnp.arange(h) - h / 2.0)[:, None]
    xx = jnp.abs(jnp.arange(w) - w / 2.0)[None, :]
    lp = jnp.exp(-(yy**2 + xx**2) / (2 * (h / 8.0) ** 2))
    from miccai24_immoco_tpu.ops.fft import ifft2c

    return ifft2c(fft2c(x) * lp)


def _identity_cols(key, w, n_corrupt, h):
    cols = jax.random.permutation(key, w)[:n_corrupt]
    ident = jnp.ones((w,)).at[cols].set(0.0)
    return jnp.broadcast_to(ident[None, :], (h, w))


def test_apply_shift_moves_content():
    """apply_shift(x, dy, dx) moves content toward higher indices."""
    x = jnp.zeros((16, 16), jnp.complex64).at[4, 5].set(1.0 + 0j)
    y = apply_shift(x, 3.0, 2.0)
    iy, ix = np.unravel_index(int(jnp.argmax(jnp.abs(y))), (16, 16))
    assert (iy, ix) == (7, 7)


@pytest.mark.parametrize("dy,dx", [(5.0, -7.0), (-3.0, 11.0), (0.0, 0.0)])
def test_estimate_integer_shift(dy, dx):
    key = jax.random.PRNGKey(0)
    gt = _smooth_complex_image(key, 64, 64)
    k_meas = fft2c(gt)
    shifted = apply_shift(gt, dy, dx)
    ident = _identity_cols(jax.random.PRNGKey(1), 64, 40, 64)
    ey, ex = jax.jit(estimate_shift)(k_meas, shifted, ident)
    assert abs(float(ey) - dy) < 0.25, (float(ey), dy)
    assert abs(float(ex) - dx) < 0.25, (float(ex), dx)


def test_estimate_subpixel_shift():
    key = jax.random.PRNGKey(2)
    gt = _smooth_complex_image(key, 64, 64)
    k_meas = fft2c(gt)
    shifted = apply_shift(gt, 2.4, -1.7)
    ident = _identity_cols(jax.random.PRNGKey(3), 64, 40, 64)
    ey, ex = estimate_shift(k_meas, shifted, ident)
    assert abs(float(ey) - 2.4) < 0.35
    assert abs(float(ex) + 1.7) < 0.35


def test_recenter_restores_alignment():
    key = jax.random.PRNGKey(4)
    gt = _smooth_complex_image(key, 64, 64)
    k_meas = fft2c(gt)
    shifted = apply_shift(gt, 6.0, -4.0)
    ident = _identity_cols(jax.random.PRNGKey(5), 64, 44, 64)
    fixed, dy, dx = recenter_to_identity(k_meas, shifted, ident, max_px=30.0)
    err_before = float(jnp.abs(shifted - gt).mean())
    err_after = float(jnp.abs(fixed - gt).mean())
    assert err_after < 0.05 * err_before, (err_before, err_after)
    assert abs(float(dy) - 6.0) < 0.3 and abs(float(dx) + 4.0) < 0.3


def test_recenter_gate_blocks_large_estimates():
    key = jax.random.PRNGKey(6)
    gt = _smooth_complex_image(key, 64, 64)
    k_meas = fft2c(gt)
    shifted = apply_shift(gt, 12.0, 0.0)
    ident = _identity_cols(jax.random.PRNGKey(7), 64, 44, 64)
    fixed, dy, dx = recenter_to_identity(k_meas, shifted, ident, max_px=5.0)
    assert float(dy) == 0.0 and float(dx) == 0.0
    np.testing.assert_allclose(
        np.asarray(jnp.abs(fixed)), np.asarray(jnp.abs(shifted)), atol=1e-5
    )


def test_recenter_noop_on_aligned_fit():
    """A healthy (aligned) fit must not be perturbed: the estimate is ~0
    and the phase-ramp at ~0 shift is ~identity."""
    key = jax.random.PRNGKey(8)
    gt = _smooth_complex_image(key, 64, 64)
    k_meas = fft2c(gt)
    noisy = gt + 0.01 * _smooth_complex_image(jax.random.PRNGKey(9), 64, 64)
    ident = _identity_cols(jax.random.PRNGKey(10), 64, 44, 64)
    fixed, dy, dx = recenter_to_identity(k_meas, noisy, ident, max_px=30.0)
    assert abs(float(dy)) < 0.3 and abs(float(dx)) < 0.3
    assert float(jnp.abs(fixed - noisy).mean()) < 0.02


def test_recenter_vmappable():
    key = jax.random.PRNGKey(11)
    gts = jnp.stack(
        [_smooth_complex_image(jax.random.fold_in(key, i), 32, 32)
         for i in range(3)]
    )
    k_meas = fft2c(gts)
    shifts = jnp.asarray([[2.0, -3.0], [0.0, 5.0], [-4.0, 1.0]])
    shifted = jax.vmap(apply_shift)(gts, shifts[:, 0], shifts[:, 1])
    ident = jnp.stack(
        [_identity_cols(jax.random.fold_in(key, 100 + i), 32, 20, 32)
         for i in range(3)]
    )
    fn = jax.jit(jax.vmap(lambda k, x, m: recenter_to_identity(k, x, m, 16.0)))
    fixed, dys, dxs = fn(k_meas, shifted, ident)
    np.testing.assert_allclose(np.asarray(dys), shifts[:, 0], atol=0.3)
    np.testing.assert_allclose(np.asarray(dxs), shifts[:, 1], atol=0.3)


def test_fit_recenter_knob_no_harm_on_healthy_slice():
    """cfg.recenter_max_px threads through motion_correct and is a
    measured no-op (within estimator noise) on a healthy fit whose image
    is already anchored by the identity columns."""
    import dataclasses

    from miccai24_immoco_tpu.models.immoco import motion_correct
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
    from tests.test_immoco_fit import small_cfg, synthetic_brain

    img = synthetic_brain(64, 64)
    sim = simulate_motion_2d(jax.random.PRNGKey(2), img, n_movements=5)
    cfg = small_cfg("lattice", "lattice", iters=60, max_movements=8)
    cfg = dataclasses.replace(cfg, dc_replace=True)
    masks, _ = extract_movement_groups(sim.mask[0], 64, cfg.max_movements)

    base = motion_correct(sim.kspace, masks, cfg, key=jax.random.PRNGKey(3))
    cfg_rc = dataclasses.replace(cfg, recenter_max_px=16.0)
    rc = motion_correct(sim.kspace, masks, cfg_rc, key=jax.random.PRNGKey(3))

    # Healthy fit: the correction must be a small perturbation at most.
    rel = float(
        jnp.abs(rc.image - base.image).mean() / jnp.abs(base.image).mean()
    )
    assert rel < 0.15, rel


def test_fit_recenter_fixes_synthetic_degenerate_shift():
    """End-to-end mechanism check on a constructed degenerate case: shift
    an already-reconstructed image, present the identity columns of the
    true spectrum, and confirm the finalize-stage recentering recovers
    the aligned image (exercises _finalize_image via recenter_to_identity
    on fit-shaped inputs)."""
    from miccai24_immoco_tpu.ops.recenter import recenter_to_identity

    gt = _smooth_complex_image(jax.random.PRNGKey(20), 64, 64)
    k_meas = fft2c(gt)
    degenerate = apply_shift(gt, 7.0, 7.0)  # the measured ~7 px basin
    ident = _identity_cols(jax.random.PRNGKey(21), 64, 50, 64)
    fixed, dy, dx = recenter_to_identity(k_meas, degenerate, ident, 30.0)
    assert abs(float(dy) - 7.0) < 0.3 and abs(float(dx) - 7.0) < 0.3
    assert float(jnp.abs(fixed - gt).mean()) < 0.1 * float(
        jnp.abs(degenerate - gt).mean()
    )


def test_confidence_gate_blocks_flat_surfaces():
    """min_peak_ratio: a reconstruction unrelated to the measured data
    yields a flat correlation surface whose argmax must be rejected
    (measured failure mode: weak low-iter fits read bogus ~12 px shifts
    ungated)."""
    gt = _smooth_complex_image(jax.random.PRNGKey(30), 64, 64)
    unrelated = _smooth_complex_image(jax.random.PRNGKey(31), 64, 64)
    ident = _identity_cols(jax.random.PRNGKey(32), 64, 44, 64)
    dy, dx = estimate_shift(fft2c(gt), unrelated, ident, min_peak_ratio=10.0)
    assert float(dy) == 0.0 and float(dx) == 0.0
    # ...while a genuine shift still passes the same gate.
    dy, dx = estimate_shift(
        fft2c(gt), apply_shift(gt, 4.0, -2.0), ident, min_peak_ratio=10.0
    )
    assert abs(float(dy) - 4.0) < 0.3 and abs(float(dx) + 2.0) < 0.3
