"""U-Net denoiser training: image-space motion-artifact removal.

Recipe parity with reference train_unet_denoiser.py:

- Unet(1, 1, chans 32, 6 pools, InstanceNorm) (:28-42)
- AdamW lr 3e-4 + CosineAnnealingLR over the step budget (:45-48; the
  reference steps the scheduler per *sample* inside 200 epochs)
- per-sample on-the-fly motion corruption; input |IFFT(k_motion)| / std,
  target |IFFT(k_clean)| / same std (:120-132)
- loss = 0.16 * L1(min-max-normalized pair) + 0.84 * (1 - ssim) with the
  pytorch_msssim conventions the reference hits: data_range=255 default and
  nonnegative (ReLU'd) SSIM (:51-59 — replicated verbatim, including that
  the L1 term normalizes but the SSIM term does not)
- checkpoint gate: validation SSIM improvement vs corrupted >= 10 SSIM
  points (:77-78,:200-210)

The reference's fifth training script, train_unet_denoiser_classification.py
(the "unet_denoising_classification_task" checkpoint), is this same trainer
pointed at the detection-slice corpus — pass that corpus's k-space stack.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from miccai24_immoco_tpu.config import MotionSimConfig, UnetConfig
from miccai24_immoco_tpu.models.unet import Unet, build_unet
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.metrics import ssim as ssim_metric
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch


@dataclasses.dataclass(frozen=True)
class DenoiserTrainConfig:
    steps: int = 200
    batch_size: int = 1
    learning_rate: float = 3e-4
    seed: int = 128
    ssim_diff_gate: float = 10.0  # best_ssim_diff init (reference :78)
    # torch CosineAnnealingLR(T_max=200 "epochs") stepped per BATCH
    # (train_unet_denoiser.py:48,143): the lr oscillates with period 400
    # steps over the whole run — replicated (utils/schedules.cosine_annealing).
    anneal_t_max: int = 200


def _minmax(x):
    return (x - x.min()) / (x.max() - x.min() + 1e-12)


def _ssim_nonneg_255(x, y, data_range: float = 255.0):
    """pytorch_msssim.ssim defaults: data_range=255, nonnegative clamp.

    Implemented via the shared gaussian-window SSIM with the per-window map
    ReLU'd before averaging (nonnegative_ssim=True semantics).
    ``data_range=1.0`` is the scale-aligned variant used by the AF+
    trainer's "norm_ssim" outer loss on minmax-normalized pairs."""
    # Reuse the valid-window machinery by computing the ssim map manually.
    from miccai24_immoco_tpu.ops.metrics import (
        _filter2d_valid,
        _gaussian_kernel,
    )

    if x.ndim == 3:  # (B, H, W) -> (B, 1, H, W)
        x = x[:, None]
        y = y[:, None]
    xs = x / data_range
    ys = y / data_range
    c1, c2 = 0.01**2, 0.03**2
    kern = _gaussian_kernel(11, 1.5)
    mu_x = _filter2d_valid(xs, kern)
    mu_y = _filter2d_valid(ys, kern)
    sxx = _filter2d_valid(xs * xs, kern) - mu_x**2
    syy = _filter2d_valid(ys * ys, kern) - mu_y**2
    sxy = _filter2d_valid(xs * ys, kern) - mu_x * mu_y
    cs = (2.0 * sxy + c2) / (sxx + syy + c2)
    ss = (2.0 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1) * cs
    return jnp.mean(jax.nn.relu(ss))


def denoiser_loss(output, target):
    """Reference loss_function (train_unet_denoiser.py:51-59)."""
    l1 = jnp.abs(_minmax(output) - _minmax(target)).sum() / output.size
    return (1 - 0.84) * l1 + 0.84 * (1.0 - _ssim_nonneg_255(target, output))


def _crop_ssim(output, target):
    """The eval protocol's SSIM, differentiably: quarter-crop then min-max
    normalize then SSIM at data_range 1.0 (reference calmetric2D,
    evaluate.py:57-80 on the test_immoco.py:77-81 crop)."""
    from miccai24_immoco_tpu.ops.metrics import center_crop_quarter

    # Per-SAMPLE min-max (jax.vmap), matching the harness's per-slice
    # quarter-crop normalization — a batch-global _minmax would score a
    # slightly different quantity for batches > 1 (ADVICE r4 #2).
    o = jax.vmap(_minmax)(center_crop_quarter(output))[:, None]
    t = jax.vmap(_minmax)(center_crop_quarter(target))[:, None]
    return ssim_metric(o, t, 1.0)


def denoiser_loss_crop(output, target):
    """Crop-matched fine-tune loss (no reference counterpart — a deliberate
    divergence for the round-4 "hard" fine-tune): keep the reference's L1
    term but score the SSIM term on the quarter-crop minmax pair the eval
    protocol actually measures.  The whole-image loss rewards
    background-ringing cleanup the crop never sees (train_denoiser_hard.py
    round-4 note), which is why the first hard fine-tune won its internal
    gate yet lost the protocol metric."""
    l1 = jnp.abs(_minmax(output) - _minmax(target)).sum() / output.size
    return (1 - 0.84) * l1 + 0.84 * (1.0 - _crop_ssim(output, target))


def denoise_input(kspace: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W) complex -> ((B, H, W, 1) net input, (B, 1, 1) scale)."""
    img = jnp.abs(ifft2c(kspace))
    scale = img.std(axis=(-2, -1), keepdims=True)
    return (img / scale)[..., None], scale


def make_denoiser_trainer(
    net: Unet,
    cfg: DenoiserTrainConfig,
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    image_shape: Tuple[int, int] = (320, 320),
    crop_match: bool = False,
):
    """``crop_match=True`` switches BOTH the loss's SSIM term and the
    best-checkpoint gate to the eval protocol's quarter-crop minmax SSIM
    (see denoiser_loss_crop).  Default False = exact reference recipe."""
    from miccai24_immoco_tpu.utils.schedules import cosine_annealing

    h, w = image_shape
    schedule = cosine_annealing(cfg.learning_rate, cfg.anneal_t_max)
    opt = optax.adamw(schedule)
    loss_fn_used = denoiser_loss_crop if crop_match else denoiser_loss

    def init_fn(key):
        params = net.init(
            {"params": key}, jnp.zeros((1, h, w, 1), jnp.float32), train=False
        )["params"]
        return params, opt.init(params)

    def _train_step(params, opt_state, key, kspace_clean):
        sample = simulate_motion_batch(key, ifft2c(kspace_clean), cfg=sim_cfg)
        x, scale = denoise_input(sample.kspace)
        target = jnp.abs(ifft2c(kspace_clean)) / scale

        def loss_fn(p):
            out = net.apply({"params": p}, x, train=True)[..., 0]
            return loss_fn_used(out, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def _eval_step(params, key, kspace_clean):
        sample = simulate_motion_batch(key, ifft2c(kspace_clean), cfg=sim_cfg)
        x, scale = denoise_input(sample.kspace)
        target = jnp.abs(ifft2c(kspace_clean)) / scale
        out = net.apply({"params": params}, x, train=False)[..., 0]

        def nm(v):
            return _minmax(v)[:, None]

        # Validation metric parity: the reference logs/gates on REAL ssim
        # (normalize_image + data_range=1.0, train_unet_denoiser.py:183-187,
        # 197-206), not the data_range=255 variant its LOSS uses.
        # crop_match gates on the eval protocol's quarter-crop SSIM instead.
        if crop_match:
            s_fit = _crop_ssim(out, target)
            s_corrupt = _crop_ssim(x[..., 0], target)
        else:
            s_fit = ssim_metric(nm(out), nm(target), 1.0)
            s_corrupt = ssim_metric(nm(x[..., 0]), nm(target), 1.0)
        return {
            "loss": loss_fn_used(out, target),
            "ssim": s_fit,
            # SIGNED improvement.  This was jnp.abs(s_fit - s_corrupt),
            # which inverted the best-checkpoint gate: an early garbage
            # net (s_fit 0.16 vs s_corrupt 0.88) scored "gain" 0.72 and
            # locked out every genuinely-improving later step (+0.02..0.06)
            # — both round-2 distribution denoiser checkpoints shipped that
            # garbage state (caught round 3 by the first image-metric eval;
            # reference gates on signed improvement,
            # train_unet_denoiser.py:197-206).
            "ssim_gain": s_fit - s_corrupt,
        }

    train_step = jax.jit(_train_step)
    eval_step = jax.jit(_eval_step)

    import functools

    @functools.partial(jax.jit, static_argnames=("seg_len",))
    def segment_fn(
        params, opt_state, key, kspace_train, kspace_val,
        best_gain, best_params, seg_len,
    ):
        """seg_len train+eval steps in ONE compiled program with in-graph
        ssim-gain-gated best-params tracking (same RNG stream and batch
        sampling as the per-step loop; avoids per-step host round trips on
        tunneled runtimes)."""
        n_train = kspace_train.shape[0]
        n_val = kspace_val.shape[0]

        def step(carry, _):
            params, opt_state, key, best_gain, best_params = carry
            key, bk, sk, vk, vs = jax.random.split(key, 5)
            idx = jax.random.choice(
                bk, n_train, (min(cfg.batch_size, n_train),), replace=False
            )
            params, opt_state, loss = _train_step(
                params, opt_state, sk, jnp.take(kspace_train, idx, axis=0)
            )
            vidx = jax.random.choice(
                vk, n_val, (min(cfg.batch_size, n_val),), replace=False
            )
            stats = _eval_step(
                params, vs, jnp.take(kspace_val, vidx, axis=0)
            )
            better = stats["ssim_gain"] >= best_gain
            best_gain = jnp.where(better, stats["ssim_gain"], best_gain)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_params, params
            )
            return (
                (params, opt_state, key, best_gain, best_params),
                (loss, stats),
            )

        (params, opt_state, key, best_gain, best_params), (losses, stats) = (
            jax.lax.scan(
                step,
                (params, opt_state, key, best_gain, best_params),
                None,
                length=seg_len,
            )
        )
        return params, opt_state, key, best_gain, best_params, losses, stats

    return init_fn, train_step, eval_step, segment_fn


def denoise(net: Unet, params, kspace: jnp.ndarray) -> jnp.ndarray:
    """Single-forward correction (reference test_unet_denoiser.py:53-71):
    (B, H, W) complex corrupted k-space -> (B, H, W) magnitude images."""
    x, scale = denoise_input(kspace)
    out = net.apply({"params": params}, x, train=False)[..., 0]
    return out * scale


def denoise_dc(
    net: Unet, params, kspace: jnp.ndarray, line_ind: jnp.ndarray
) -> jnp.ndarray:
    """Data-consistency-projected denoiser inference (deliberate divergence
    — the reference denoiser is image-space only, test_unet_denoiser.py:
    53-71; DC projection is the standard MRI consistency step and uses the
    framework's own klD-Net detection, test_immoco.py:50-61).

    ``line_ind``: (B, W) bool, True on detector-flagged CORRUPTED k-space
    columns.  Measured columns the detector marks clean are kept verbatim
    (they are exact on the noise-free corpora); the denoiser's estimate
    fills only the corrupted columns.  This preserves texture on clean
    lines — exactly what the quarter-crop eval penalizes the plain
    denoiser's smoothing for (round-4 hard-scenario gap).  The denoiser
    output magnitude is treated as a real image for the k-space projection
    (the synthetic corpora have real non-negative GT).

    Call under jit only (creates complex values — CLAUDE.md landmine 1).
    """
    from miccai24_immoco_tpu.ops.fft import fft2c

    img = denoise(net, params, kspace)
    k_dn = fft2c(img.astype(kspace.dtype))
    k_out = jnp.where(line_ind[:, None, :], k_dn, kspace)
    return jnp.abs(ifft2c(k_out))


def train_denoiser(
    kspace_train: jnp.ndarray,
    kspace_val: jnp.ndarray,
    cfg: DenoiserTrainConfig = DenoiserTrainConfig(),
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    steps: Optional[int] = None,
    log_every: int = 20,
    log_fn: Callable[[int, Dict], None] = lambda i, s: None,
    unet_cfg: Optional[UnetConfig] = None,
    ckpt_path: Optional[str] = None,
    save_every: int = 500,
    ckpt_meta: Optional[Dict] = None,
):
    steps = steps or cfg.steps
    # Default arch = the reference's Unet(1, 1, 32, 6, InstanceNorm)
    # (train_unet_denoiser.py:35-42); the distributed checkpoint uses a
    # smaller override (chans 16 / 5 pools) so the weights fit in-repo —
    # see weights.py denoiser_full.
    net = build_unet(unet_cfg or UnetConfig(
        in_chans=1, out_chans=1, chans=32, num_pool_layers=6,
        norm="instance"))
    h, w = kspace_train.shape[-2:]
    init_fn, _, _, segment_fn = make_denoiser_trainer(
        net, cfg, sim_cfg, (h, w)
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, ik = jax.random.split(key)
    params, opt_state = init_fn(ik)

    gate = cfg.ssim_diff_gate / 100.0
    # Track the best gain ACHIEVED (init -inf), not "best above the gate":
    # seeding the tracker at the gate meant a run whose genuine gains
    # stayed below it silently kept the random init as best_params.  The
    # reference gate (>= ssim_diff_gate SSIM points,
    # train_unet_denoiser.py:197-206) is reported separately via
    # ``best_gain``/the gated ``best`` return.
    best_gain = jnp.asarray(-jnp.inf, jnp.float32)
    best_params = params
    done = 0
    while done < steps:
        seg = min(log_every, steps - done)
        (params, opt_state, key, best_gain, best_params, losses, stats) = (
            segment_fn(
                params, opt_state, key, kspace_train, kspace_val,
                best_gain, best_params, seg_len=seg,
            )
        )
        done += seg
        log_fn(done - 1, {"loss_train": float(losses[-1]),
                          **{k: float(v[-1]) for k, v in stats.items()}})
        if ckpt_path and (done % save_every < seg or done >= steps):
            # Overwrite-safe periodic save of the gated-best params so a
            # tunnel hang (CLAUDE.md landmine 10a) loses at most save_every
            # steps of progress.
            from miccai24_immoco_tpu.utils.checkpoint import save as _save

            _save(ckpt_path, best_params, {
                **(ckpt_meta or {}),
                "steps_done": done, "best_gain": float(best_gain),
            })
    best = best_params if float(best_gain) > gate else None
    return net, params, best
