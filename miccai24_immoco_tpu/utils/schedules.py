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
