"""Loss functions for the instance fits and baseline trainings.

Semantics track the reference exactly (src/utils/losses.py):

- ``gradient_entropy``: E = -sum(g * log(g + 1e-24)) over g = |dx| + |dy|
  with the forward differences zero-padded back to full size and *no*
  normalization (losses.py:20-40).  Operates on complex images: the
  per-axis difference is taken in the complex domain and then the complex
  magnitude is used, matching ``(x[:, :-1] - x[:, 1:]).abs()`` on a torch
  complex tensor.
- ``tv_loss``: anisotropic TV summed over real and imaginary parts
  (losses.py:6-17).
- ``real_pair_mse``: MSE over the (Re, Im)-stacked view of complex inputs,
  i.e. mean over 2*N elements, matching
  ``F.mse_loss(view_as_real(a), view_as_real(b))`` (immoco.py:170-172).
  Mirroring this exactly keeps gradient *scale* identical to the reference,
  which matters because the fit recipe (lr, lambda) is tuned to it.
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_entropy(x: jnp.ndarray) -> jnp.ndarray:
    """Gradient entropy of a (H, W) complex or real image (unnormalized)."""
    dx = jnp.abs(x[:, :-1] - x[:, 1:])
    dy = jnp.abs(x[:-1, :] - x[1:, :])
    dx = jnp.pad(dx, ((0, 0), (0, 1)))
    dy = jnp.pad(dy, ((0, 1), (0, 0)))
    g = dx + dy
    return -jnp.sum(g * jnp.log(g + 1e-24))


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation over Re and Im parts of a (H, W) image."""
    total = jnp.asarray(0.0, dtype=x.real.dtype)
    for part in (x.real, x.imag):
        total = (
            total
            + jnp.sum(jnp.abs(part[:, :-1] - part[:, 1:]))
            + jnp.sum(jnp.abs(part[:-1, :] - part[1:, :]))
        )
    return total


def real_pair_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MSE between complex arrays viewed as stacked (Re, Im) reals.

    Equals ``mean(|a - b|^2) / 2`` but written in the real domain so the
    value (and autodiff behavior) matches torch's
    ``mse_loss(view_as_real(a), view_as_real(b))`` exactly.
    """
    d = a - b
    return jnp.mean(jnp.stack([d.real**2, d.imag**2]))
