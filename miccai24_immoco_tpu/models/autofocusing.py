"""Autofocusing baseline: per-movement-group rigid parameters optimized under
a gradient-entropy autofocus metric.

Reference behavior (src/models/autofocusing.py:8-91 + driver
src/test/test_autofocusing.py:61-74):

- learnable per-group (rotation deg, x shift, y shift), init 0
- forward: IFFT(kspace * mask_g) per group -> rotation-compensated affine ->
  bicubic grid_sample (grid built align_corners=True, sampled False) ->
  FFT -> recompose with the unmasked lines from the input
- k-space pre-scaled by max |IFFT(k)| (driver :61-63)
- 60 Adam iterations, lr = 1.0, loss = 1e-4 * GradientEntropy(IFFT(out))

Two reference quirks are replicated *deliberately* (they only reparametrize
the optimization variables, so behavior is identical):

- the rotation matrix is transposed before use (autofocusing.py:39)
- the y-shift accumulates the x-shift term (autofocusing.py:53-56 writes
  ``shift[:, 1] = shift[:, 0] + ...``) — a benign linear reparameterization
  of (x, y) since the optimizer owns both inputs.

TPU-native: all groups warp batched; the 60-step loop is one lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from miccai24_immoco_tpu.config import AutofocusingConfig
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy
from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample
from miccai24_immoco_tpu.ops.warp_mm import bicubic_sample_mm


class AutofocusResult(NamedTuple):
    image: jnp.ndarray  # (H, W) complex, corrected (input scale)
    kspace: jnp.ndarray  # (H, W) complex
    losses: jnp.ndarray  # (iters,)


def autofocus_forward(params, ks_input: jnp.ndarray, masks: jnp.ndarray,
                      warp_impl: str = "matmul"):
    """params: dict(rot, x_shifts, y_shifts) each (M,); masks (M, H, W).

    warp_impl "matmul" runs the bicubic resampling as one-hot MXU matmuls
    (gather/scatter-free, same semantics; see ops/warp_mm.py); "gather" is
    the torch-semantics reference path.
    """
    h, w = ks_input.shape
    m = masks.shape[0]

    images = ifft2c(ks_input[None] * masks)  # (M, H, W)

    rad = jnp.deg2rad(params["rot"])
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # Reference transposes the rotation matrix (autofocusing.py:39).
    r00, r01 = cos, sin
    r10, r11 = -sin, cos

    tx, ty = params["x_shifts"], params["y_shifts"]
    shift0 = -(r00 * tx + r01 * ty)
    # Reference quirk: y shift adds shift0 (autofocusing.py:53-56).
    shift1 = shift0 + (-(r10 * tx + r11 * ty))

    # Translation normalized per-component by (2*shape - 1)
    # (autofocusing.py:67-69; shape = (H, W)).
    theta = jnp.stack(
        [
            jnp.stack([r00, r01, shift0 / (2.0 * h - 1.0)], -1),
            jnp.stack([r10, r11, shift1 / (2.0 * w - 1.0)], -1),
        ],
        axis=1,
    )  # (M, 2, 3)

    grids = affine_grid(theta, (h, w), align_corners=True)
    if warp_impl == "matmul":
        warped = bicubic_sample_mm(images, grids, align_corners=False)
    else:
        warped = grid_sample(
            images[:, None], grids, mode="bicubic", padding_mode="zeros",
            align_corners=False,
        )[:, 0]

    return ks_input * (1.0 - masks.sum(0)) + (fft2c(warped) * masks).sum(0)


def make_autofocus_fit(cfg: AutofocusingConfig = AutofocusingConfig()):
    """Jittable (kspace, masks) -> AutofocusResult with the driver's recipe."""
    opt = optax.adam(cfg.learning_rate)

    def fit(kspace: jnp.ndarray, masks: jnp.ndarray) -> AutofocusResult:
        scale = jnp.abs(ifft2c(kspace)).max()
        ks = kspace / scale
        m = masks.shape[0]
        params = {
            "rot": jnp.zeros((m,), jnp.float32),
            "x_shifts": jnp.zeros((m,), jnp.float32),
            "y_shifts": jnp.zeros((m,), jnp.float32),
        }
        state = opt.init(params)

        def loss_fn(p):
            k_out = autofocus_forward(p, ks, masks, cfg.warp_impl)
            return gradient_entropy(ifft2c(k_out)) * cfg.loss_scale

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, _), losses = jax.lax.scan(
            step, (params, state), None, length=cfg.iters
        )
        k_out = autofocus_forward(params, ks, masks, cfg.warp_impl) * scale
        return AutofocusResult(image=ifft2c(k_out), kspace=k_out, losses=losses)

    return fit
