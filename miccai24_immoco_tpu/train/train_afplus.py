"""AF+ metric-network training: bilevel optimization through the unrolled
autofocus inner loop.

Recipe parity with reference train_afplus_original.py:110-235:

- inner: 30 hand-rolled-Adam AF+ steps on per-line (x, y, rot) params,
  differentiated through (torch needs create_graph=True; in JAX the unroll
  is just part of the outer loss graph).  The *training* inner loop skips
  the zero_middle freeze (the reference comments it out, :157-159) — kept.
- input k-space normalized Ft((IFt(ks) - mean)/std) after simulation (:136)
- outer loss = 0.16 * L1(minmax pair) + 0.84 * (1 - nonneg ssim@255) on the
  corrected vs GT magnitudes x 1e4 (:69-74,:205-207), gradients accumulated
  over 16 samples, global-norm clip 1.0, Adam lr 5e-5 + cosine (:105-106)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from miccai24_immoco_tpu.config import AFPlusConfig, MotionSimConfig, UnetConfig
from miccai24_immoco_tpu.models.unet import Unet, build_unet
from miccai24_immoco_tpu.models.af_plus import rotate_kspace
from miccai24_immoco_tpu.ops.fft import fft2c, ifft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
from miccai24_immoco_tpu.train.train_denoiser import _minmax, _ssim_nonneg_255


@dataclasses.dataclass(frozen=True)
class AFPlusTrainConfig:
    steps: int = 200 * 50  # epochs x samples in the reference loop
    inner_iters: int = 30
    accumulate: int = 16
    learning_rate: float = 5e-5
    clip_norm: float = 1.0
    seed: int = 228
    nufft_oversamp: int = 5
    # Chunked KB gridding (ops/nufft.py): peak-memory control for the
    # bilevel unroll; 0 = unchunked. 12800 = 8 chunks at 320^2.
    nufft_chunk: int = 12800
    # Bilevel-stability knobs (see afplus_inner_unrolled; all off =
    # verbatim reference semantics, which NaN on occasional draws).
    rot_moment_detach: bool = False
    inner_eps: float = 0.0
    # Detach the inner Adam's rsqrt preconditioner in the backward: the
    # inner FORWARD update is bit-identical, but the outer gradient flows
    # only through the linear first-moment path.  Every observed NaN source
    # is a d/dg [rsqrt(m2)] = -g (1-b2) m2^{-3/2} factor (m2 floors at
    # 1e-24 -> m2^{-3/2} ~ 1e36, overflowing f32 whenever a per-line inner
    # gradient decays toward zero mid-chain — which partially trained
    # metric nets routinely cause); dropping the preconditioner's
    # derivative removes the m2 chain entirely while keeping the
    # magnitude-bounded m1 chain that carries the learning signal.
    precond_detach: bool = False
    # Backward cotangent clipping at every inner-step boundary (0 = off).
    # Measured (scripts/probe_afplus_nan_tpu.py): the outer gradient grows
    # ~10x PER INNER STEP (gnorm ~4 at inner=1, ~1e5 at 5, ~1e10 at 10,
    # overflow/NaN at 30 for both the 32/6 and 16/5 nets) — the
    # lr*(1-b1)*rsqrt(m2) factor of the m1 chain amplifies cotangents
    # wherever per-line inner gradients decay toward the 1e-24 m2 floor,
    # so the 30-step chain overflows f32 no matter the outer clip (the
    # reference recipe hits the same math; torch f32 overflows
    # identically — its published checkpoint was trained on textured
    # fastMRI data where inner gradients do not decay to the floor).
    # cotangent_clip=c rescales the (xs, ys, rot, moments) cotangent
    # pytree to global norm <= c at each step boundary (non-finite
    # components zeroed first): the inner FORWARD is bit-identical, each
    # step's contribution to the metric-net gradient keeps its direction,
    # and the chain growth is structurally bounded.  Combine with
    # precond_detach (kills the in-step rsqrt-derivative NaN source).
    cotangent_clip: float = 0.0
    # Per-SAMPLE global-norm clip applied BEFORE gradient accumulation
    # (0 = off).  The reference calls clip_grad_norm_(1.0) after EVERY
    # sample's backward on the running .grad buffer
    # (train_afplus_original.py:207-208), so no single sample's gradient
    # can contribute more than unit norm to the accumulated update.  Our
    # MultiSteps accumulator averages RAW grads and only clips the mean —
    # one intermittent ~1e14-gnorm sample (the bilevel rot-chain blow-up,
    # scripts/probe_afplus_nan.py) then dominates the update direction
    # entirely, which matches the observed flat-loss runs.  sample_clip
    # bounds each sample's influence like the reference's running clip.
    sample_clip_norm: float = 0.0
    # Outer loss variant.  "ref" = verbatim reference loss_function
    # (train_afplus_original.py:69-74,205-207): 0.16*L1(minmax pair) +
    # 0.84*(1 - nonneg ssim@255) on (AF+ output, GT) x 1e4 — but the AF+
    # output descends from the std-NORMALIZED corrupted k-space (:136)
    # while the GT stays at raw corpus scale, and AF+ phase manipulations
    # are magnitude-preserving, so the ssim luminance term is pinned by an
    # unfixable scale ratio.  Measured on the synthetic corpus: the ssim
    # term sits at ~4e-4 from init — the 0.84-weighted term is saturated
    # and its gradient points along the unfixable scale direction (the
    # reference's preprocessed fastMRI tensors may sit at a scale where
    # the term is live; ours provably does not).  "norm_ssim" minmax-
    # normalizes BOTH images for the ssim term too (data_range=1), making
    # it scale-free like the L1 term already is.
    outer_loss: str = "ref"
    # Truncated backprop through the inner unroll (0 = full chain =
    # reference semantics).  trunc_bptt=k runs the same forward but takes
    # the outer gradient only through the LAST k inner steps
    # (lax.stop_gradient on the carry at the truncation boundary, so the
    # first iters-k steps contribute neither chained nor direct terms).
    # Rationale (measured, scripts/probe_afplus_nan_tpu.py + the step-1900
    # signal probe): the cotangent norm grows ~10x PER STEP through the
    # inner Adam chain, so the full-30-step gradient is dominated by the
    # chain's most-explosive directions — after 2000 precond_cot steps the
    # trained net scored WORSE than random init on held-out slices
    # (artifacts/afplus_full/probe_signal_step1900.log), i.e. the clipped
    # full-chain gradient is noise.  Truncation is the standard estimator
    # for unrolled bilevel problems: bounded chain growth (~10^k), real
    # signal from the steps nearest the loss.
    trunc_bptt: int = 0


def _cotangent_clip(tree, c: float):
    """Identity on ``tree`` in the forward; in the backward, zero
    non-finite cotangent entries and rescale the cotangent pytree to
    global norm <= ``c`` (AFPlusTrainConfig.cotangent_clip)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)

    @jax.custom_vjp
    def ident(*leaves):
        return tuple(leaves)

    def fwd(*leaves):
        return tuple(leaves), None

    def bwd(_, cts):
        cts = tuple(jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
                    for g in cts)
        n = jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum() for g in cts))
        scale = jnp.minimum(1.0, c / jnp.maximum(n, 1e-30))
        return tuple(g * scale for g in cts)

    ident.defvjp(fwd, bwd)
    return jax.tree_util.tree_unflatten(treedef, ident(*flat))


def afplus_inner_unrolled(
    metric_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ks: jnp.ndarray,
    iters: int,
    oversamp: int,
    cfg: AFPlusConfig = AFPlusConfig(),
    nufft_chunk: int = 0,
    rot_moment_detach: bool = False,
    inner_eps: float = 0.0,
    precond_detach: bool = False,
    cotangent_clip: float = 0.0,
    trunc_bptt: int = 0,
):
    """Run `iters` AF+ Adam steps, differentiable end-to-end; returns the
    corrected k-space (the training variant without zero_middle)."""
    ps = ks.shape[-1]
    lin = jnp.linspace(0.0, float(ps), ps)
    mag = jnp.abs(ks)
    ang = jnp.angle(ks)

    def transform(xs, ys, rot):
        phase = -2.0 * math.pi * (
            lin[:, None] * xs[None, :] + (ys * lin)[None, :]
        )
        new_k = mag * jnp.exp(1j * (ang + phase))
        return rotate_kspace(new_k, rot, oversamp, nufft_chunk=nufft_chunk)

    def inner_loss(xs, ys, rot):
        img = jnp.abs(ifft2c(transform(xs, ys, rot)))
        return jnp.mean(img * 1e4 * jax.nn.sigmoid(metric_fn(img * 1e4)))

    b1, b2 = cfg.b1, cfg.b2
    z = jnp.zeros((ps,), jnp.float32)

    @jax.checkpoint
    def one_inner(xs, ys, rot, m):
        # Rematerialized per inner iteration: the outer (metric-network)
        # gradient differentiates through all `iters` unrolled steps
        # (torch create_graph=True, train_afplus_original.py:157-212);
        # without remat every step's NUFFT intermediates — two
        # (H*W, os_grid) one-hot KB matrices each — stay live at once.
        gx, gy, gr = jax.grad(inner_loss, argnums=(0, 1, 2))(xs, ys, rot)
        gx, gy, gr = (
            gx * cfg.grad_scale, gy * cfg.grad_scale, gr * cfg.grad_scale
        )
        # The reference detaches the x/y moments every iteration but NOT
        # the rot moments (train_afplus_original.py:181-187 — x_moment1
        # .detach() vs rot_moment1 bare): the outer gradient therefore
        # differentiates through the full 30-step chain of rot's
        # rsqrt(moment2) updates, whose derivative has 1/|g| factors that
        # blow up whenever an inner rot gradient crosses zero — the NaN
        # source the zero_nans guard was masking (probe:
        # scripts/probe_afplus_nan.py). rot_moment_detach=True treats rot
        # like x/y (a one-token change the reference plausibly intended);
        # inner_eps adds a torch-style epsilon inside the rsqrt. Both
        # default off = verbatim reference semantics.
        md = jax.lax.stop_gradient if rot_moment_detach else (lambda v: v)
        m = (
            b1 * jax.lax.stop_gradient(m[0]) + (1 - b1) * gx,
            b2 * jax.lax.stop_gradient(m[1]) + (1 - b2) * gx * gx + 1e-24,
            b1 * jax.lax.stop_gradient(m[2]) + (1 - b1) * gy,
            b2 * jax.lax.stop_gradient(m[3]) + (1 - b2) * gy * gy + 1e-24,
            b1 * md(m[4]) + (1 - b1) * gr,
            b2 * md(m[5]) + (1 - b2) * gr * gr + 1e-24,
        )
        # precond_detach (AFPlusTrainConfig): same forward update, but the
        # rsqrt(moment2) preconditioner is a constant to the outer backward
        # (the rsqrt DERIVATIVE's m2^{-3/2} factor is the f32-overflow NaN
        # source; the m1 path keeps the outer gradient's learning signal).
        pd = jax.lax.stop_gradient if precond_detach else (lambda v: v)
        xs = xs - cfg.learning_rate * m[0] * pd(jax.lax.rsqrt(m[1] + inner_eps))
        ys = ys - cfg.learning_rate * m[2] * pd(jax.lax.rsqrt(m[3] + inner_eps))
        rot = rot - cfg.learning_rate * m[4] * pd(jax.lax.rsqrt(m[5] + inner_eps))
        return xs, ys, rot, m

    def scan_body(carry, _):
        xs, ys, rot, m = carry
        carry = one_inner(xs, ys, rot, m)
        if cotangent_clip > 0:
            # AFTER the step in the forward = BEFORE the step's vjp in the
            # backward: every cotangent entering a step body (including
            # the outer loss's own, at the last step) is already bounded,
            # so each step's metric-net contribution is bounded too.
            carry = _cotangent_clip(carry, cotangent_clip)
        return carry, None

    # lax.scan, not a Python unroll: gradients flow through scan identically
    # (the outer metric-network grad differentiates the whole inner
    # optimization either way), but the traced graph is 1 body instead of
    # `iters` copies — the unrolled variant took >40 min to compile on the
    # remote TPU compile service at 320^2.
    carry = (z, z, z, (z,) * 6)
    if 0 < trunc_bptt < iters:
        # Truncated BPTT (AFPlusTrainConfig.trunc_bptt): identical forward,
        # but the first iters-k steps sit behind a stop_gradient boundary —
        # no cotangent enters the first scan, so its backward is never
        # built (cheaper too).
        carry, _ = jax.lax.scan(
            scan_body, carry, None, length=iters - trunc_bptt
        )
        carry = jax.lax.stop_gradient(carry)
        carry, _ = jax.lax.scan(scan_body, carry, None, length=trunc_bptt)
    else:
        carry, _ = jax.lax.scan(scan_body, carry, None, length=iters)
    xs, ys, rot, m = carry
    return transform(xs, ys, rot)


def make_afplus_trainer(
    net: Unet,
    cfg: AFPlusTrainConfig = AFPlusTrainConfig(),
    sim_cfg: MotionSimConfig = MotionSimConfig(),
    image_shape=(320, 320),
):
    h, w = image_shape
    opt = optax.chain(
        # Stability guard (divergence from the reference, which has none:
        # train_afplus_original.py:213-218): the outer gradient
        # differentiates through 30 chained inner-Adam rsqrt updates and
        # occasionally yields NaN for a sample; without zeroing, one bad
        # sample poisons the accumulated update and the whole run (observed
        # at 320^2: first NaN within 30 steps).  zero_nans sits OUTSIDE
        # MultiSteps so it zeroes the offending SAMPLE before accumulation —
        # inside, it only saw the already-poisoned 16-sample sum and zeroed
        # the entire optimizer update (with NaNs at all frequent, most
        # updates became no-ops: the round-2 run's loss was flat for 1270
        # steps = 79 wiped updates).
        optax.zero_nans(),
        *(
            [optax.clip_by_global_norm(cfg.sample_clip_norm)]
            if cfg.sample_clip_norm > 0
            else []
        ),
        optax.MultiSteps(
            optax.chain(
                optax.clip_by_global_norm(cfg.clip_norm),
                optax.adam(
                    optax.cosine_decay_schedule(
                        cfg.learning_rate, max(cfg.steps // cfg.accumulate, 1)
                    )
                ),
            ),
            cfg.accumulate,
        ),
    )

    def init_fn(key):
        params = net.init(
            {"params": key}, jnp.zeros((1, h, w, 1), jnp.float32), train=False
        )["params"]
        return params, opt.init(params)

    def metric_fn_of(params):
        return lambda img: net.apply(
            {"params": params}, img[None, :, :, None], train=False
        )[0, :, :, 0]

    @jax.jit
    def train_step(params, opt_state, key, kspace_clean):
        gt_img = jnp.abs(ifft2c(kspace_clean))
        sim = simulate_motion_2d(key, ifft2c(kspace_clean), cfg=sim_cfg)
        img_c = ifft2c(sim.kspace)
        ks = fft2c(
            (img_c - jnp.abs(img_c).mean()) / (jnp.abs(img_c).std() + 1e-11)
        )

        def loss_fn(p):
            yp_ks = afplus_inner_unrolled(
                metric_fn_of(p), ks, cfg.inner_iters, cfg.nufft_oversamp,
                nufft_chunk=cfg.nufft_chunk,
                rot_moment_detach=cfg.rot_moment_detach,
                inner_eps=cfg.inner_eps,
                precond_detach=cfg.precond_detach,
                cotangent_clip=cfg.cotangent_clip,
                trunc_bptt=cfg.trunc_bptt,
            )
            out = jnp.abs(ifft2c(yp_ks))[None, None] * 1e4
            tgt = gt_img[None, None] * 1e4
            # denoiser_loss (reference loss_function) decomposed for
            # diagnostics: a saturated ssim term (scale
            # mismatch between the std-normalized AF+ output and the raw-
            # scale GT) makes the 0.84-weighted term a constant and starves
            # the outer gradient.
            l1 = jnp.abs(_minmax(out) - _minmax(tgt)).sum() / out.size
            if cfg.outer_loss == "norm_ssim":
                # Scale-aligned variant (AFPlusTrainConfig.outer_loss):
                # ssim on the same minmax-normalized pair the L1 term uses.
                ssim_v = _ssim_nonneg_255(
                    _minmax(tgt), _minmax(out), data_range=1.0
                )
            else:
                ssim_v = _ssim_nonneg_255(tgt, out)
            loss = (1 - 0.84) * l1 + 0.84 * (1.0 - ssim_v)
            return loss, (l1, ssim_v)

        (loss, (l1_v, ssim_v)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # Per-sample diagnostics: the NaN rate decides whether the bilevel
        # gradient is healthy (zero_nans turns a NaN sample into a zero
        # update — frequent NaNs mean the run is silently not learning).
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        stats = {"loss": loss, "gnorm": gnorm,
                 "l1": l1_v, "ssim": ssim_v,
                 "nonfinite": (~jnp.isfinite(gnorm)).astype(jnp.float32)}
        return optax.apply_updates(params, updates), opt_state, stats

    return init_fn, train_step, metric_fn_of
