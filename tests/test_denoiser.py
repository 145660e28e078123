"""Denoiser trainer tests (small shapes)."""

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_denoiser import (
    DenoiserTrainConfig,
    denoise,
    denoiser_loss,
    denoiser_loss_crop,
    make_denoiser_trainer,
)


def test_denoiser_loss_zero_for_identical(rng):
    x = jnp.asarray(rng.random((1, 1, 32, 32)).astype(np.float32)) * 10
    assert float(denoiser_loss(x, x)) < 1e-3


def test_denoiser_loss_positive_for_noise(rng):
    x = jnp.asarray(rng.random((1, 1, 32, 32)).astype(np.float32)) * 10
    y = x + jnp.asarray(rng.standard_normal((1, 1, 32, 32)).astype(np.float32)) * 3
    assert float(denoiser_loss(x, y)) > float(denoiser_loss(x, x))


def test_denoiser_train_step_reduces_loss():
    images = phantom_stack(4, 48, 48, seed=4)
    ksp = fft2c(images)
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=8,
                                num_pool_layers=3, norm="instance"))
    cfg = DenoiserTrainConfig(steps=25, batch_size=2, learning_rate=1e-3)
    init_fn, train_step, eval_step, _ = make_denoiser_trainer(
        net, cfg, image_shape=(48, 48)
    )
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(25):
        key, sk = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sk, ksp[:2])
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    stats = eval_step(params, jax.random.PRNGKey(2), ksp[2:])
    assert np.isfinite(float(stats["ssim"]))

    out = denoise(net, params, ksp[:1])
    assert out.shape == (1, 48, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_dc_projection_invariants():
    """DC projection: all-clean indicators return the measured image
    exactly; all-corrupted indicators return the plain denoiser output."""
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.train.train_denoiser import denoise_dc

    images = phantom_stack(2, 64, 64, seed=1)
    ksp = fft2c(images)
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=4,
                                num_pool_layers=2, norm="instance"))
    params = net.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, 64, 64, 1)), train=False)["params"]
    f = jax.jit(lambda k, ind: denoise_dc(net, params, k, ind))
    out_clean = f(ksp, jnp.zeros((2, 64), bool))
    assert float(jnp.abs(out_clean - jnp.abs(ifft2c(ksp))).max()) < 1e-5
    out_corrupt = f(ksp, jnp.ones((2, 64), bool))
    dn = jax.jit(lambda k: denoise(net, params, k))(ksp)
    assert float(jnp.abs(out_corrupt - jnp.abs(dn)).max()) < 1e-5


def test_denoiser_loss_crop_scores_crop_only(rng):
    """The crop-matched loss's SSIM term must ignore the outer quarter
    margins the eval protocol never sees (ops/metrics.center_crop_quarter)."""
    x = jnp.asarray(rng.random((1, 64, 64)).astype(np.float32))
    assert float(denoiser_loss_crop(x, x)) < 1e-3
    # Corrupt ONLY the outer margin: crop loss stays near zero (its L1 term
    # still sees the margin, so compare against the whole-image loss).
    y = x.at[:, :8, :].add(0.5)
    assert float(denoiser_loss_crop(x, y)) < float(denoiser_loss(x, y))
    # Corrupt only the center: both penalize.
    z = x.at[:, 24:40, 24:40].add(0.5)
    assert float(denoiser_loss_crop(x, z)) > 0.05


def test_denoiser_crop_match_gate_uses_crop_metric():
    """crop_match=True trains + gates on quarter-crop SSIM gain; the
    segment path must run and track a finite best gain."""
    images = phantom_stack(4, 48, 48, seed=4)
    ksp = fft2c(images)
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=4,
                                num_pool_layers=2, norm="instance"))
    cfg = DenoiserTrainConfig(steps=4, batch_size=1)
    init_fn, _, eval_step, seg = make_denoiser_trainer(
        net, cfg, image_shape=(48, 48), crop_match=True
    )
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    bg = jnp.asarray(-jnp.inf, jnp.float32)
    params, opt_state, _, bg, bp, losses, stats = seg(
        params, opt_state, jax.random.PRNGKey(1), ksp[:3], ksp[3:],
        bg, params, seg_len=3,
    )
    assert np.isfinite(np.asarray(losses)).all()
    assert np.isfinite(float(bg))
    assert float(bg) == float(np.max(np.asarray(stats["ssim_gain"])))
