"""Image-quality metrics in pure jnp, following the reference protocol.

The reference evaluates PSNR / SSIM / HaarPSI / RMSE on min-max-normalized
magnitudes (src/utils/evaluate.py:57-80) of H/4-center-cropped images
(src/test/test_immoco.py:77-81).  piq (GPU torch) supplied SSIM/HaarPSI
there; both are reimplemented here deterministically:

- ``ssim``: Wang et al. SSIM with an 11x11 sigma-1.5 gaussian window, valid
  convolution, k1=0.01/k2=0.03, and the official MATLAB pre-downsampling
  rule max(1, round(min(H, W)/256)) — matching piq.ssim defaults.
- ``haarpsi``: Reisenhofer et al. 2018 (the algorithm piq.haarpsi
  implements): 3-scale Haar wavelet magnitude similarity with C=30,
  alpha=4.2, 2x subsampling; identical-input score 1.0.
- ``psnr``: the reference's my_psnr (evaluate.py:37-47) with data_range=1.
- ``rmse``: global RMSE (evaluate.py:32-34).

``calmetric2d`` bundles all four on (B, C, H, W) arrays like evaluate.py:57-80.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Batchwise min-max to [0, 1] over (B, C, H, W), evaluate.py:19-29."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    lo = flat.min(axis=1).reshape(b, 1, 1, 1)
    hi = flat.max(axis=1).reshape(b, 1, 1, 1)
    if b > 1:
        return (x - lo) / (hi - lo + 1e-24)
    # The reference's single-sample branch has no epsilon guard; keep the
    # epsilon (harmless at reference scales, avoids NaN on constant inputs).
    return (x - lo) / (hi - lo + 1e-24)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, data_range: float = 1.0):
    """(B, C, H, W) mean PSNR with fixed data range (evaluate.py:37-47)."""
    mse = jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log10(data_range / jnp.sqrt(mse)))


def rmse(pred: jnp.ndarray, gt: jnp.ndarray):
    return jnp.sqrt(jnp.mean((pred - gt) ** 2))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d_valid(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid 2-D correlation of (B, C, H, W) with (kh, kw)."""
    b, c, h, w = x.shape
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel[None, None], (c, 1, kh, kw))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    b, c, h, w = x.shape
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / float(k * k)


def ssim(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    kernel_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    downsample: bool = True,
):
    """Mean SSIM over a (B, C, H, W) batch (piq.ssim-compatible defaults)."""
    x = pred / data_range
    y = gt / data_range
    if downsample:
        f = max(1, int(round(min(x.shape[-2:]) / 256)))
        if f > 1:
            x = _avg_pool(x, f)
            y = _avg_pool(y, f)
    c1 = k1**2
    c2 = k2**2
    kern = _gaussian_kernel(kernel_size, kernel_sigma)
    mu_x = _filter2d_valid(x, kern)
    mu_y = _filter2d_valid(y, kern)
    sxx = _filter2d_valid(x * x, kern) - mu_x**2
    syy = _filter2d_valid(y * y, kern) - mu_y**2
    sxy = _filter2d_valid(x * y, kern) - mu_x * mu_y
    cs = (2.0 * sxy + c2) / (sxx + syy + c2)
    ss = (2.0 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1) * cs
    return jnp.mean(ss)


def _haar_filters(scale: int) -> jnp.ndarray:
    """(2, 2^s, 2^s) horizontal/vertical Haar wavelet filters at a scale.

    Filter values are +-2^-s = +-1/n, the official HaarPSI normalization
    (MATLAB reference ``HaarPSIDec``: ``2^(-scale)*ones(2^scale)``) — NOT
    1/n^2: the similarity constant C=30 is absolute, so the coefficient
    scale is part of the metric's definition.  Sign orientation is
    irrelevant downstream (coefficients are used in absolute value).
    """
    n = 2**scale
    f = np.ones((n, n), np.float32) / n
    horiz = f.copy()
    horiz[: n // 2, :] *= -1.0  # difference across rows
    vert = f.copy()
    vert[:, : n // 2] *= -1.0  # difference across columns
    return jnp.asarray(np.stack([horiz, vert]))


def _filter2d_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """'same' correlation of (B, 1, H, W) with (kh, kw) (zero padding)."""
    kh, kw = kernel.shape
    pad_h = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    pad_w = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel[None, None],
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def haarpsi(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    scales: int = 3,
    subsample: bool = True,
    c: float = 30.0,
    alpha: float = 4.2,
):
    """HaarPSI for grayscale (B, C, H, W) in [0, 1] (C must be 1).

    Implements Reisenhofer et al., "A Haar wavelet-based perceptual
    similarity index for image quality assessment" (the algorithm backing
    piq.haarpsi, used at evaluate.py:77).
    """
    x = pred * 255.0
    y = gt * 255.0
    if subsample:
        # Official subsampling: zero-pad odd extents, 2x2 stride-2 mean
        # (MATLAB HaarPSISubsample / piq: F.pad + avg_pool2d).
        ph, pw = x.shape[-2] % 2, x.shape[-1] % 2
        pad = ((0, 0), (0, 0), (0, ph), (0, pw))
        x = _avg_pool(jnp.pad(x, pad), 2)
        y = _avg_pool(jnp.pad(y, pad), 2)

    coeffs_x = []  # per scale: (B, 2, H, W) |responses| for (horiz, vert)
    coeffs_y = []
    for s in range(1, scales + 1):
        filt = _haar_filters(s)  # (2, n, n)
        cx = jnp.concatenate(
            [_filter2d_same(x, filt[o]) for o in range(2)], axis=1
        )
        cy = jnp.concatenate(
            [_filter2d_same(y, filt[o]) for o in range(2)], axis=1
        )
        coeffs_x.append(jnp.abs(cx))
        coeffs_y.append(jnp.abs(cy))

    # Local similarity from the first two scales.
    sim = jnp.zeros_like(coeffs_x[0])
    for s in range(2):
        a, b = coeffs_x[s], coeffs_y[s]
        sim = sim + (2.0 * a * b + c) / (a**2 + b**2 + c)
    sim = sim / 2.0  # (B, 2, H, W)

    # Weights from the coarsest scale.
    w = jnp.maximum(coeffs_x[scales - 1], coeffs_y[scales - 1])

    l_sim = jax.nn.sigmoid(alpha * sim)
    num = jnp.sum(l_sim * w, axis=(1, 2, 3))
    den = jnp.sum(w, axis=(1, 2, 3)) + 1e-12
    r = num / den
    score = (jnp.log(r / (1.0 - r)) / alpha) ** 2
    return jnp.mean(score)


class Metrics2D(NamedTuple):
    psnr: jnp.ndarray
    ssim: jnp.ndarray
    haarpsi: jnp.ndarray
    rmse: jnp.ndarray


def calmetric2d(pred: jnp.ndarray, gt: jnp.ndarray) -> Metrics2D:
    """Reference calmetric2D (evaluate.py:57-80): min-max normalize both,
    then PSNR/SSIM/HaarPSI/RMSE with data_range=1."""
    if pred.ndim != 4 or gt.ndim != 4:
        raise ValueError("Input tensors must be 4D (B, C, H, W)")
    p = normalize_batch(pred)
    g = normalize_batch(gt)
    # Small-input fallback mirroring evaluate.py:66-71: shrink the SSIM
    # window and the HaarPSI scale count below 11px extents.
    kernel = 11
    scales = 3
    min_hw = min(p.shape[-1], p.shape[-2])
    if min_hw < kernel:
        kernel = max(min_hw - 1, 2)
        scales = max(int(np.log2(kernel)), 1)
    return Metrics2D(
        psnr=psnr(p, g, 1.0),
        ssim=ssim(p, g, 1.0, kernel_size=kernel),
        haarpsi=haarpsi(p, g, scales=scales),
        rmse=rmse(p, g),
    )


def center_crop_quarter(img: jnp.ndarray) -> jnp.ndarray:
    """Crop H/4 and W/4 margins per side (test_immoco.py:77-81 protocol)."""
    h, w = img.shape[-2:]
    ch, cw = h // 4, w // 4
    return img[..., ch : h - ch, cw : w - cw]


# --- Segmentation / classification metrics (reference evaluate.py:194-244) ---


def dice_coef(y_true: jnp.ndarray, y_pred: jnp.ndarray, smooth: float = 1.0):
    inter = jnp.sum(y_true * y_pred)
    union = jnp.sum(y_true) + jnp.sum(y_pred)
    return (2.0 * inter + smooth) / (union + smooth)


def iou_coef(y_true: jnp.ndarray, y_pred: jnp.ndarray, smooth: float = 1.0):
    inter = jnp.sum(jnp.abs(y_true * y_pred))
    union = jnp.sum(y_true) + jnp.sum(y_pred) - inter
    return (inter + smooth) / (union + smooth)


def classification_metrics(y_pred: jnp.ndarray, y_gt: jnp.ndarray):
    """Sensitivity/specificity/precision/F1 on binary arrays
    (evaluate.py:208-244, spelling corrected)."""
    tp = jnp.sum((y_pred == 1) & (y_gt == 1))
    fp = jnp.sum((y_pred == 1) & (y_gt == 0))
    tn = jnp.sum((y_pred == 0) & (y_gt == 0))
    sens = tp / jnp.sum(y_gt == 1)
    spec = tn / jnp.sum(y_gt == 0)
    prec = tp / (tp + fp)
    f1 = 2.0 * prec * sens / (prec + sens)
    return {
        "sensitivity": sens,
        "specificity": spec,
        "precision": prec,
        "f1": f1,
    }
