"""Learning-rate schedules.

``cosine_warm_restarts`` replicates torch's CosineAnnealingWarmRestarts
(used for klD-Net at reference train_kld_net.py:31: T_0 = steps // 6,
T_mult = 2), including the reference quirk that the scheduler is only
stepped after iteration 5 (train_kld_net.py:82-83), exposed as
``delay_steps``.  Fully traceable (optax-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(
    base_lr: float,
    t0: int,
    t_mult: int = 2,
    eta_min: float = 0.0,
    delay_steps: int = 0,
):
    """optax-compatible schedule fn: step -> lr, with warm restarts.

    Cycle i spans t0 * t_mult^i steps; within a cycle the lr follows a
    cosine from base_lr to eta_min, snapping back at each restart.
    """

    def schedule(step):
        s = jnp.maximum(0, jnp.asarray(step) - delay_steps).astype(jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(s, t0)
            t_i = jnp.asarray(float(t0))
        else:
            m = float(t_mult)
            # cycle = floor(log_m(s/t0 * (m-1) + 1))
            cycle = jnp.floor(
                jnp.log(s / t0 * (m - 1.0) + 1.0 + 1e-9) / jnp.log(m)
            )
            start = t0 * (m**cycle - 1.0) / (m - 1.0)
            t_i = t0 * m**cycle
            t_cur = s - start
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i)
        )

    return schedule


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR semantics, INCLUDING its periodic behavior
    past t_max: lr(t) = eta_min + (base_lr - eta_min)(1 + cos(pi t/T)) / 2
    for all t.  The reference denoiser constructs it with T_max = 200
    epochs but steps it EVERY BATCH (train_unet_denoiser.py:48,143), so
    over a 200x200-step run the lr oscillates base->0->base with period
    2*T_max — replicated verbatim (it shapes what the denoiser learns)."""

    def schedule(step):
        t = jnp.asarray(step).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / t_max)
        )

    return schedule
