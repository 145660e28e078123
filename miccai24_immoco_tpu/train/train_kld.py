"""klD-Net training: k-space line detection with on-the-fly motion simulation.

Recipe parity with reference train_kld_net.py:

- U-Net(2 -> 1, chans 32, 4 pools) over (Re, Im) k-space channels (:20,:68)
- AdamW lr 1e-4 (:26-28), CosineAnnealingWarmRestarts(T_0=steps//6, T_mult=2)
  stepped only after iteration 5 (:31,:82-83)
- batch 4 random slices per step, fresh motion simulation every step (:57-66)
- BCE-with-logits against the line mask (:29,:72)
- per-step validation batch with dice/IoU/classification metrics (:87-120)
- dice-gated best checkpointing, gate 0.80 (:53,:122-126)

TPU-native: the whole step (sampling, simulation, forward, loss, update) is
one jitted function; the simulation is vmapped, not a per-sample Python loop.

Documented divergence: the reference trains on *unnormalized* k-space but
evaluates with per-sample std normalization (test_immoco.py:50-58).  We use
the inference-time normalization in both phases for consistency.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from miccai24_immoco_tpu.config import KLDTrainConfig, MotionSimConfig, UnetConfig
from miccai24_immoco_tpu.models.unet import Unet, build_unet
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.metrics import classification_metrics, dice_coef, iou_coef
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
from miccai24_immoco_tpu.utils.schedules import cosine_warm_restarts


def kspace_to_input(kspace: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) complex k-space -> (B, H, W, 2) normalized network input.

    Normalization: divide by std of |IFFT(k)| per sample, the inference
    convention at reference test_immoco.py:50-58.
    """
    img_std = jnp.std(jnp.abs(ifft2c(kspace)), axis=(-2, -1), keepdims=True)
    k = kspace / (img_std + 1e-12)
    return jnp.stack([k.real, k.imag], axis=-1)


@dataclasses.dataclass
class KLDTrainState:
    params: dict
    opt_state: optax.OptState
    step: int
    best_dice: float
    best_params: Optional[dict]


def make_kld_trainer(
    net: Unet,
    cfg: KLDTrainConfig,
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    image_shape: Tuple[int, int] = (320, 320),
):
    """Returns (init_fn, train_step, eval_step); all jitted, data-on-device."""
    h, w = image_shape
    schedule = cosine_warm_restarts(
        cfg.learning_rate,
        t0=max(cfg.steps // cfg.cosine_t0_div, 1),
        t_mult=cfg.cosine_t_mult,
        delay_steps=6,
    )
    opt = optax.adamw(schedule)

    def init_fn(key, params: Optional[dict] = None) -> Tuple[dict, optax.OptState]:
        if params is None:
            params = net.init(
                {"params": key}, jnp.zeros((1, h, w, 2), jnp.float32),
                train=False,
            )["params"]
        return params, opt.init(params)

    def simulate(key, kspace_clean):
        """Corrupt a clean (B, H, W) complex k-space batch."""
        images = ifft2c(kspace_clean)
        sample = simulate_motion_batch(key, images, cfg=sim_cfg)
        return sample.kspace, sample.mask.astype(jnp.float32)

    def _train_step(params, opt_state, key, kspace_batch):
        # kspace_batch may be the FULL training stack: when it is larger
        # than the configured batch size, sampling happens inside the jit
        # (host-side fancy indexing costs a dispatch round-trip per step on
        # tunneled runtimes).
        k_key, d_key, b_key = jax.random.split(key, 3)
        if kspace_batch.shape[0] > cfg.batch_size:
            idx = jax.random.choice(
                b_key, kspace_batch.shape[0], (cfg.batch_size,), replace=False
            )
            kspace_batch = jnp.take(kspace_batch, idx, axis=0)
        k_corrupt, mask = simulate(k_key, kspace_batch)
        x = kspace_to_input(k_corrupt)

        def loss_fn(p):
            logits = net.apply(
                {"params": p}, x, train=True, rngs={"dropout": d_key}
            )[..., 0]
            return optax.sigmoid_binary_cross_entropy(logits, mask).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _eval_step(params, key, kspace_batch):
        if kspace_batch.shape[0] > cfg.batch_size:
            key, b_key = jax.random.split(key)
            idx = jax.random.choice(
                b_key, kspace_batch.shape[0], (cfg.batch_size,), replace=False
            )
            kspace_batch = jnp.take(kspace_batch, idx, axis=0)
        k_corrupt, mask = simulate(key, kspace_batch)
        x = kspace_to_input(k_corrupt)
        logits = net.apply({"params": params}, x, train=False)[..., 0]
        loss = optax.sigmoid_binary_cross_entropy(logits, mask).mean()
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        stats = {
            "loss": loss,
            "dice": dice_coef(pred, mask),
            "iou": iou_coef(pred, mask),
            "pixel_acc": jnp.mean(pred == mask),
        }
        stats.update(classification_metrics(pred, mask))
        return stats

    train_step = jax.jit(_train_step)
    eval_step = jax.jit(_eval_step)

    import functools

    @functools.partial(jax.jit, static_argnames=("seg_len",))
    def segment_fn(
        params, opt_state, key, kspace_train, kspace_val,
        best_dice, best_params, seg_len,
    ):
        """Advance ``seg_len`` train+eval steps in ONE compiled program with
        in-graph best-dice checkpoint tracking.

        On tunneled TPU runtimes every host dispatch + scalar readback costs
        ~40 ms; the reference recipe evaluates EVERY step (train_kld_net.py:
        87-120), so a per-step Python loop pays ~3 readbacks/step.  The
        segment keeps the per-step RNG stream, optimizer schedule, and
        dice-gated best-params semantics identical to the per-step loop
        (same jax.random.split(key, 3) sequence).
        """

        def step(carry, _):
            params, opt_state, key, best_dice, best_params = carry
            key, s_key, vs_key = jax.random.split(key, 3)
            params, opt_state, loss = _train_step(
                params, opt_state, s_key, kspace_train
            )
            stats = _eval_step(params, vs_key, kspace_val)
            better = stats["dice"] > best_dice
            best_dice = jnp.where(better, stats["dice"], best_dice)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_params, params
            )
            return (
                (params, opt_state, key, best_dice, best_params),
                (loss, stats),
            )

        (params, opt_state, key, best_dice, best_params), (losses, stats) = (
            jax.lax.scan(
                step,
                (params, opt_state, key, best_dice, best_params),
                None,
                length=seg_len,
            )
        )
        return params, opt_state, key, best_dice, best_params, losses, stats

    return init_fn, train_step, eval_step, segment_fn


def train_kld_net(
    kspace_train: jnp.ndarray,
    kspace_val: jnp.ndarray,
    cfg: KLDTrainConfig = KLDTrainConfig(),
    unet_cfg: UnetConfig = UnetConfig(),
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    steps: Optional[int] = None,
    log_every: int = 50,
    log_fn: Callable[[int, Dict], None] = lambda i, s: None,
    resume_params: Optional[dict] = None,
) -> KLDTrainState:
    """Full training loop over device-resident (N, H, W) complex stacks.

    resume_params: previously saved network params to continue from (the
    reference is save-only with no resume, SURVEY.md §5; optimizer state
    restarts fresh, matching the reference's best-checkpoint semantics).
    """
    steps = steps or cfg.steps
    net = build_unet(unet_cfg)
    h, w = kspace_train.shape[-2:]
    init_fn, _, _, segment_fn = make_kld_trainer(net, cfg, sim_cfg, (h, w))
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params, opt_state = init_fn(init_key, params=resume_params)

    # Segmented driver: one compiled program advances ``log_every`` steps
    # with in-graph best-params tracking (same RNG stream and dice-gating
    # semantics as a per-step loop; per-step host readbacks would cost more
    # than the compute on tunneled runtimes).
    best_dice = jnp.asarray(cfg.best_dice_gate, jnp.float32)
    best_params = params
    done = 0
    while done < steps:
        seg = min(log_every, steps - done)
        (params, opt_state, key, best_dice, best_params, losses, stats) = (
            segment_fn(
                params, opt_state, key, kspace_train, kspace_val,
                best_dice, best_params, seg_len=seg,
            )
        )
        done += seg
        log_fn(
            done - 1,
            {
                "loss_train": float(losses[-1]),
                **{k: float(v[-1]) for k, v in stats.items()},
            },
        )

    best_dice = float(best_dice)
    improved = best_dice > cfg.best_dice_gate
    return KLDTrainState(
        params=params,
        opt_state=opt_state,
        step=steps,
        best_dice=best_dice,
        best_params=best_params if improved else None,
    )


def predict_line_mask(net: Unet, params, kspace: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) complex -> (B, H, W) bool predicted corrupted-line mask,
    the inference path of reference test_immoco.py:50-58."""
    x = kspace_to_input(kspace)
    logits = net.apply({"params": params}, x, train=False)[..., 0]
    return jax.nn.sigmoid(logits) > 0.5


def mask_to_line_indicators(mask: jnp.ndarray, threshold: float = 0.2) -> jnp.ndarray:
    """(H, W) pixel mask -> (W,) column indicators: column flagged when >20%
    of its rows are flagged (test_immoco.py:59-61)."""
    return (mask.astype(jnp.float32).sum(axis=0) / mask.shape[0]) > threshold
