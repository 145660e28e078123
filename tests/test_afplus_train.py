"""AF+ metric-net bilevel training smoke test (tiny shapes)."""

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import UnetConfig
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.train.train_afplus import (
    AFPlusTrainConfig,
    afplus_inner_unrolled,
    make_afplus_trainer,
)


def test_inner_unroll_differentiable():
    img = phantom_stack(1, 24, 24, seed=2)[0]
    ks = fft2c(img)

    def outer(w):
        metric = lambda x: x * w
        out = afplus_inner_unrolled(metric, ks, iters=2, oversamp=2)
        return jnp.abs(out).sum()

    g = jax.grad(outer)(jnp.asarray(0.1))
    assert np.isfinite(float(g))


def test_afplus_trainer_step_runs():
    img = phantom_stack(1, 24, 24, seed=3)[0]
    ks = fft2c(img)
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=4,
                                num_pool_layers=2, norm="instance"))
    cfg = AFPlusTrainConfig(steps=4, inner_iters=2, accumulate=2,
                            nufft_oversamp=2)
    init_fn, train_step, metric_fn_of = make_afplus_trainer(
        net, cfg, image_shape=(24, 24)
    )
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    for i in range(2):
        params, opt_state, stats = train_step(
            params, opt_state, jax.random.PRNGKey(i), ks
        )
        assert np.isfinite(float(stats["loss"]))
        assert float(stats["nonfinite"]) in (0.0, 1.0)


def test_precond_detach_forward_identical_grad_finite():
    """precond_detach changes ONLY the backward: the inner unroll's output
    (forward value) is bit-identical to the reference semantics, and the
    outer gradient stays finite (the rsqrt-derivative m2^{-3/2} factors are
    gone from the graph)."""
    img = phantom_stack(1, 24, 24, seed=5)[0]
    ks = fft2c(img)

    def run(w, pd):
        metric = lambda x: x * w
        out = afplus_inner_unrolled(
            metric, ks, iters=3, oversamp=2, precond_detach=pd
        )
        return jnp.abs(out).sum()

    w = jnp.asarray(0.1)
    v_ref = float(run(w, False))
    v_pd = float(run(w, True))
    assert v_ref == v_pd
    g = jax.grad(lambda w: run(w, True))(w)
    assert np.isfinite(float(g))


def test_cotangent_clip_forward_identical_grad_bounded():
    """cotangent_clip changes ONLY the backward: the inner unroll's output
    is bit-identical to clip-off, the outer gradient is finite, and
    scaling the outer loss by 1e12 (which would scale an unclipped
    gradient by 1e12) leaves the clipped gradient's magnitude bounded by
    the per-boundary rescale."""
    img = phantom_stack(1, 24, 24, seed=7)[0]
    ks = fft2c(img)

    def run(w, cc, scale=1.0):
        metric = lambda x: x * w
        out = afplus_inner_unrolled(
            metric, ks, iters=3, oversamp=2, precond_detach=True,
            cotangent_clip=cc,
        )
        return jnp.abs(out).sum() * scale

    w = jnp.asarray(0.1)
    assert float(run(w, 0.0)) == float(run(w, 1.0))
    g = float(jax.grad(lambda w: run(w, 1.0))(w))
    g_big = float(jax.grad(lambda w: run(w, 1.0, scale=1e12))(w))
    assert np.isfinite(g) and np.isfinite(g_big)
    # The huge-cotangent run is clipped at every boundary: its gradient
    # cannot be 1e12x the unit-scale one.
    assert abs(g_big) < 1e6 * max(abs(g), 1e-12)


def test_trunc_bptt_forward_identical_grad_truncated():
    """trunc_bptt changes ONLY the backward: the inner unroll's output is
    bit-identical to full-chain, the gradient is finite, and it differs
    from the full-chain gradient (only the last k steps contribute)."""
    img = phantom_stack(1, 24, 24, seed=7)[0]
    ks = fft2c(img)

    def run(w, trunc):
        metric = lambda x: x * w
        out = afplus_inner_unrolled(
            metric, ks, iters=4, oversamp=2, trunc_bptt=trunc
        )
        return jnp.abs(out).sum()

    w = jnp.asarray(0.1)
    assert float(run(w, 0)) == float(run(w, 2))
    g_full = float(jax.grad(lambda w: run(w, 0))(w))
    g_t2 = float(jax.grad(lambda w: run(w, 2))(w))
    assert np.isfinite(g_t2)
    assert g_t2 != g_full
    # trunc >= iters falls back to the single full scan.
    assert float(run(w, 4)) == float(run(w, 0))
