"""U-Net and klD-Net training tests (small shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import KLDTrainConfig, MotionSimConfig, UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import Unet, build_denoiser, build_kld_net
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_kld import (
    kspace_to_input,
    mask_to_line_indicators,
    predict_line_mask,
    train_kld_net,
)
from miccai24_immoco_tpu.utils.schedules import cosine_warm_restarts


def test_unet_shapes():
    net = Unet(in_chans=2, out_chans=1, chans=8, num_pool_layers=3)
    x = jnp.zeros((2, 64, 64, 2))
    params = net.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y = net.apply({"params": params}, x)
    assert y.shape == (2, 64, 64, 1)


def test_unet_odd_sizes_reflect_pad():
    net = Unet(in_chans=1, out_chans=1, chans=4, num_pool_layers=2)
    x = jnp.zeros((1, 37, 45, 1))
    params = net.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y = net.apply({"params": params}, x)
    assert y.shape == (1, 37, 45, 1)


def test_unet_channel_progression_matches_reference():
    """chans doubling per pool + bottleneck 2x, mirroring unet.py:53-73."""
    net = Unet(in_chans=2, out_chans=1, chans=8, num_pool_layers=4)
    x = jnp.zeros((1, 32, 32, 2))
    params = net.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    widths = [
        params[k]["Conv_0"]["kernel"].shape[-1]
        for k in sorted(p for p in params if p.startswith("ConvBlock"))
    ]
    assert max(widths) == 8 * 16  # bottleneck = chans * 2^pools


def test_builders():
    kld = build_kld_net()
    assert kld.in_chans == 2 and kld.num_pool_layers == 4 and kld.chans == 32
    den = build_denoiser()
    assert den.in_chans == 1 and den.num_pool_layers == 6


def test_cosine_warm_restarts_schedule():
    sched = cosine_warm_restarts(1.0, t0=10, t_mult=2, delay_steps=0)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(5)) == pytest.approx(0.5, abs=1e-6)
    # Restart at t0: lr back to max.
    assert float(sched(10)) == pytest.approx(1.0, abs=1e-6)
    # Second cycle lasts 20 steps; midpoint at 20.
    assert float(sched(20)) == pytest.approx(0.5, abs=1e-6)
    d = cosine_warm_restarts(1.0, t0=10, delay_steps=6)
    assert float(d(3)) == pytest.approx(1.0)


def test_kld_training_learns_small():
    """A short training run on small phantoms should reduce loss and produce
    a usable line detector (dice above chance)."""
    images = phantom_stack(6, 64, 64, seed=1)
    ksp = fft2c(images)
    cfg = KLDTrainConfig(steps=30, batch_size=2, learning_rate=3e-4, seed=0)
    unet_cfg = UnetConfig(in_chans=2, out_chans=1, chans=8, num_pool_layers=3)
    logs = []
    state = train_kld_net(
        ksp[:4],
        ksp[4:],
        cfg=cfg,
        unet_cfg=unet_cfg,
        steps=30,
        log_every=29,
        log_fn=lambda i, s: logs.append(s),
    )
    assert len(logs) == 2
    assert logs[-1]["loss_train"] < logs[0]["loss_train"]
    assert np.isfinite(logs[-1]["dice"])


def test_kspace_input_and_indicators(rng):
    images = phantom_stack(1, 32, 32, seed=2)
    ksp = fft2c(images)
    x = kspace_to_input(ksp)
    assert x.shape == (1, 32, 32, 2)
    mask = jnp.zeros((32, 32)).at[:, 5:8].set(1.0)
    ind = mask_to_line_indicators(mask)
    np.testing.assert_array_equal(
        np.asarray(ind), np.asarray(mask[0] > 0)
    )
    # Sub-threshold columns are dropped.
    weak = jnp.zeros((32, 32)).at[:5, 10].set(1.0)
    assert not bool(mask_to_line_indicators(weak)[10])


def test_kld_training_resume(tmp_path):
    """Save -> resume round-trip continues training without structure errors."""
    from miccai24_immoco_tpu.train.train_kld import train_kld_net
    from miccai24_immoco_tpu.utils.checkpoint import restore, save

    images = phantom_stack(4, 32, 32, seed=7)
    ksp = fft2c(images)
    cfg = KLDTrainConfig(steps=2, batch_size=2, learning_rate=3e-4)
    unet_cfg = UnetConfig(in_chans=2, out_chans=1, chans=4, num_pool_layers=2)
    state = train_kld_net(ksp[:3], ksp[3:], cfg=cfg, unet_cfg=unet_cfg, steps=2)
    p = str(tmp_path / "ck")
    save(p, state.params)
    resumed = train_kld_net(
        ksp[:3], ksp[3:], cfg=cfg, unet_cfg=unet_cfg, steps=2,
        resume_params=restore(p),
    )
    assert resumed.step == 2


def test_cosine_annealing_matches_torch_per_batch_stepping():
    """cosine_annealing must reproduce torch CosineAnnealingLR stepped per
    batch — INCLUDING its periodic climb past T_max (the reference denoiser
    recipe, train_unet_denoiser.py:48,143)."""
    import torch

    from miccai24_immoco_tpu.utils.schedules import cosine_annealing

    t_max, base = 7, 3e-4
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
    ours = cosine_annealing(base, t_max)
    for step in range(30):
        want = opt.param_groups[0]["lr"]
        got = float(ours(step))
        assert got == pytest.approx(want, rel=1e-4, abs=1e-10), (step, got, want)
        opt.step()
        tsched.step()
