"""Identity-column recentering: undo a common-mode shift of a motion fit.

Failure mode being corrected (measured, PERFORMANCE.md "failing heavy"
attribution + the round-2 low-frequency correlation probe): when a
movement band owns the k-space CENTER columns, the instance fit's
cheapest minimum aligns the Image INR to that group's motion — the
recon becomes a translated copy of the anatomy (every group fits a
near-uniform compensating displacement, ~7 px vs ~2 px healthy), the
mismatch on the low-energy identity columns costs almost nothing in the
k-space L2, and GT-referenced metrics collapse.  7 of the 12 worst
heavy-protocol slices in artifacts/e2e_round2_50slice have >77% of
their clean k-space energy inside corrupted columns.

The identity (uncorrupted) columns of the measured k-space are verbatim
samples of the motion-free anatomy's spectrum, so the common-mode shift
is observable without ground truth: phase-correlate the INR image's
spectrum against the measured spectrum over identity columns only and
read the peak.  The correction is applied to the image (an exact
spectral phase ramp — no resampling) BEFORE the hard data-consistency
projection (models/immoco._dc_project), so the projected output mixes
aligned content with the measured columns instead of ghosting.

This is a deliberate divergence from the reference (which always
returns the fit as-is, src/models/immoco.py:206) and ships default-off
(config.py recenter_max_px = 0).  Everything is jit-safe, static-shape,
vmappable, and runs once per fit (2 FFTs + an argmax — negligible).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c


def _freqs(n: int) -> jnp.ndarray:
    """Centered integer frequency coordinates matching fft2c's fftshift
    layout: value k at array index i corresponds to fftfreq(n)*n shifted
    so the DC bin sits at index n//2."""
    return jnp.fft.fftshift(jnp.fft.fftfreq(n, dtype=jnp.float32) * n)


def _parabolic_refine(cm: jnp.ndarray, c0: jnp.ndarray, cp: jnp.ndarray):
    """Sub-bin offset of a quadratic through (-1, cm), (0, c0), (+1, cp),
    clamped to [-0.5, 0.5] (flat/degenerate neighborhoods -> 0)."""
    denom = cm - 2.0 * c0 + cp
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


def estimate_shift(
    k_meas: jnp.ndarray,
    image: jnp.ndarray,
    identity_cols: jnp.ndarray,
    eps: float = 1e-6,
    min_peak_ratio: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the (dy, dx) pixel shift of ``image`` relative to the
    anatomy evidenced by the measured identity columns.

    ``k_meas``: (H, W) complex measured k-space (fft2c convention).
    ``image``: (H, W) complex reconstructed image.
    ``identity_cols``: (H, W) float/bool — 1 on uncorrupted entries
      (typically column-constant: ``1 - masks.sum(0)``).
    ``min_peak_ratio``: confidence gate — report (0, 0) unless the
      correlation peak exceeds this multiple of the surface mean.  A
      genuine shift concentrates the whitened spectrum into one sharp
      peak (ratio >> 10); a weak/blurry reconstruction leaves a flat
      noise surface whose argmax is spurious (measured: a 64² low-iter
      CPU fit reads a bogus ~12 px shift ungated).

    Returns float (dy, dx) such that ``apply_shift(image, dy, dx)``
    aligns the image with the identity-column evidence.  Phase
    correlation with spectral whitening; sub-pixel via separable
    parabolic peak refinement on the wrapped correlation surface.
    """
    h, w = image.shape[-2:]
    k_img = fft2c(image)
    cross = k_meas * jnp.conj(k_img)
    # Whitened (phase-only) correlation: a shift is a unit-magnitude phase
    # ramp, so the masked inverse transform is a sharp peak at the shift.
    cross = cross / (jnp.abs(cross) + eps)
    cross = cross * identity_cols.astype(cross.dtype)
    corr = jnp.abs(ifft2c(cross))
    flat = jnp.argmax(corr.reshape(-1))
    py = flat // w
    px = flat % w

    def _at(dy, dx):
        # corr[(py+dy) % h, (px+dx) % w] without gathers beyond two
        # scalar dynamic slices (once per fit — cost-free).
        r = jax.lax.dynamic_slice(
            jnp.roll(corr, shift=(-dy, -dx), axis=(-2, -1)),
            (py, px), (1, 1),
        )
        return r[0, 0]

    c0 = _at(0, 0)
    offy = _parabolic_refine(_at(-1, 0), c0, _at(1, 0))
    offx = _parabolic_refine(_at(0, -1), c0, _at(0, 1))

    # ifft2c's ifftshift places lag 0 at index (h//2, w//2); wrap to
    # centered lags in [-n/2, n/2).  The whitened cross-spectrum
    # k_meas·conj(k_img) of an image shifted by +d carries ramp
    # e^{+2πik·d/N}, whose inverse transform peaks at lag −d — negate to
    # report the image's shift (tests/test_recenter.py pins this).
    dy = (h // 2) - (py.astype(jnp.float32) + offy)
    dx = (w // 2) - (px.astype(jnp.float32) + offx)
    if min_peak_ratio > 0:
        confident = c0 > min_peak_ratio * corr.mean()
        dy = jnp.where(confident, dy, 0.0)
        dx = jnp.where(confident, dx, 0.0)
    return dy, dx


def apply_shift(image: jnp.ndarray, dy, dx) -> jnp.ndarray:
    """Shift ``image`` by (dy, dx) pixels (positive = toward higher
    index) via an exact spectral phase ramp (circular boundary)."""
    h, w = image.shape[-2:]
    ky = _freqs(h)
    kx = _freqs(w)
    phase = (-2.0 * jnp.pi) * (
        ky[:, None] * (dy / h) + kx[None, :] * (dx / w)
    )
    ramp = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return ifft2c(fft2c(image) * ramp)


def recenter_to_identity(
    k_meas: jnp.ndarray,
    image: jnp.ndarray,
    identity_cols: jnp.ndarray,
    max_px: float,
    min_peak_ratio: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Estimate and undo the common-mode shift, double-gated: estimates
    beyond ``max_px`` (either axis) or whose correlation peak fails the
    ``min_peak_ratio`` confidence gate are treated as spurious and no
    correction is applied.  Returns (image', dy, dx) — the dy/dx
    actually applied (0 when gated).

    MEASURED at protocol scale (scripts/probe_recenter.py, 320² heavy
    protocol config, worst DC-corrupted slices 1/4/25/12 + controls):
    the estimator reads ~0 shift on every slice — the degenerate-basin
    failures are NOT a recoverable rigid translation at full scale (the
    fit's own k-space L2 already anchors translation through the same
    identity columns).  The knob therefore ships as a safety/diagnostic
    (default-off, measured-neutral), not a claimed quality win."""
    dy, dx = estimate_shift(
        k_meas, image, identity_cols, min_peak_ratio=min_peak_ratio
    )
    ok = (jnp.abs(dy) <= max_px) & (jnp.abs(dx) <= max_px)
    dy = jnp.where(ok, dy, 0.0)
    dx = jnp.where(ok, dx, 0.0)
    # apply_shift(image, -d) moves content back toward the identity frame.
    return apply_shift(image, -dy, -dx), dy, dx
