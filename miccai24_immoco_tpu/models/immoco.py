"""IM-MoCo: joint Image-INR + Motion-INR self-supervised instance fit.

Reference behavior (src/models/immoco.py:48-206):

forward (immoco.py:82-113):
  1. image  = ImageINR(identity grid)                  -> complex (H, W)
  2. grids  = tanh(MotionINR((movement, x, y) grid)) + identity grid
  3. motion_images[g] = grid_sample(image, grids[g], bilinear, zeros,
                                    align_corners=False)
  4. kspace_out = FFT(image) * (1 - sum(masks))
                + sum_g FFT(motion_images[g]) * masks[g]

fit (immoco.py:116-206):
  - k-space pre-scaled to max-abs 16000 (immoco.py:137-139)
  - Adam lr 1e-2 over both INRs, 200 iterations
  - loss = MSE(view_as_real(kspace_out), view_as_real(kspace_in))
         + lambda * GradientEntropy(image)
  - lambda halves after every iteration j with j % (iters//10) != 0 and
    j > iters//2 (immoco.py:180-181 — the quirky schedule is replicated
    verbatim because it shapes the converged image; see lambda_schedule).

TPU-native design: the whole 200-iteration fit is ONE ``lax.scan`` inside one
XLA graph (vs ~10 kernel launches per PyTorch step), with the INR gather
plans / interpolation matrices hoisted out of the loop; movement-group count
is padded to a static maximum (zero masks are forward-model invariant);
batched fits are a ``vmap`` away (see parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from miccai24_immoco_tpu.config import InstanceFitConfig
from miccai24_immoco_tpu.models.inr import INRSpec, build_inr
from miccai24_immoco_tpu.ops.dft import centered_dft_statics, fft2c_mm
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy, real_pair_mse
from miccai24_immoco_tpu.ops.warp import grid_sample, identity_grid
from miccai24_immoco_tpu.ops.warp_mm import bilinear_sample_mm


class FitResult(NamedTuple):
    image: jnp.ndarray  # (H, W) complex64 — corrected image (input scale)
    kspace_forward: jnp.ndarray  # (H, W) complex64 — final forward model
    losses: jnp.ndarray  # (iters,) float32 — per-iteration total loss


def lambda_schedule(cfg: InstanceFitConfig) -> np.ndarray:
    """Per-iteration gradient-entropy weight, replicating immoco.py:180-181.

    For the default 200 iterations this keeps lambda at its initial value for
    the first half and then halves it after almost every iteration (all
    j > 100 except multiples of 20), driving the prior to ~0 so late
    iterations purely enforce data consistency.
    """
    lam = cfg.lambda_ge
    sched = np.empty(cfg.iters, np.float32)
    decade = max(cfg.iters // 10, 1)
    for j in range(cfg.iters):
        sched[j] = lam
        if cfg.schedule_variant == "downstream":
            # test_immoco_downstream.py:188-189 variant.
            if j % 10 == 0 and j > 80:
                lam *= 0.5
        elif (j % decade) != 0 and j > (cfg.iters // 2):
            lam *= 0.5
    return sched


def ema_schedule(cfg: InstanceFitConfig) -> np.ndarray:
    """(iters,) per-iteration EMA blend factor (cfg.ema_decay, see
    config.py): 0 before floor(iters * ema_start_frac) — the EMA tracks the
    iterate exactly — then ema_decay."""
    betas = np.zeros(cfg.iters, np.float32)
    betas[int(cfg.iters * cfg.ema_start_frac):] = cfg.ema_decay
    return betas


def use_lam_motion_col(cfg: InstanceFitConfig) -> bool:
    """True when the motion-L2 weight is per-iteration scheduled (an extra
    fit_schedule column) instead of the constant cfg.lambda_motion."""
    return cfg.lambda_motion > 0 and cfg.lambda_motion_anneal_frac > 0


def lambda_motion_schedule(cfg: InstanceFitConfig) -> np.ndarray:
    """(iters,) per-iteration motion-L2 weight: linear decay from
    cfg.lambda_motion to 0 at floor(anneal_frac * iters), 0 after
    (config.py lambda_motion_anneal_frac rationale)."""
    end = max(int(cfg.lambda_motion_anneal_frac * cfg.iters), 1)
    i = np.arange(cfg.iters, dtype=np.float32)
    return cfg.lambda_motion * np.clip(1.0 - i / end, 0.0, 1.0)


def fit_schedule(cfg: InstanceFitConfig) -> np.ndarray:
    """Per-iteration scanned schedule: (iters,) lambda array at reference
    parity, or (iters, k) columns [lambda, ema_beta?, lambda_motion?] when
    cfg.ema_decay > 0 / use_lam_motion_col(cfg).  Row-sliceable by segment
    either way; the lambda_motion column is always LAST (the scan step
    reads x[-1])."""
    cols = [lambda_schedule(cfg)]
    if cfg.ema_decay > 0:
        cols.append(ema_schedule(cfg))
    if use_lam_motion_col(cfg):
        cols.append(lambda_motion_schedule(cfg))
    if len(cols) == 1:
        return cols[0]
    return np.stack(cols, axis=1)


def coarse_phases(cfg: InstanceFitConfig) -> Tuple[Tuple[int, int], ...]:
    """Normalized ((iters, size), ...) coarse-phase list for a fit config:
    cfg.coarse_schedule verbatim, else the single (coarse_iters,
    coarse_size) phase, else ().  Total coarse iterations are clamped to
    cfg.iters (trailing phases trimmed/dropped)."""
    if cfg.coarse_schedule:
        phases = tuple((int(i), int(s)) for i, s in cfg.coarse_schedule)
    elif cfg.coarse_iters > 0:
        phases = ((int(cfg.coarse_iters), int(cfg.coarse_size)),)
    else:
        return ()
    out, used = [], 0
    for it, sz in phases:
        it = min(max(it, 0), cfg.iters - used)
        if it > 0:
            out.append((it, sz))
            used += it
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class IMMoCoModel:
    """Compiled-shape IM-MoCo forward model for (max_movements, H, W)."""

    cfg: InstanceFitConfig
    height: int
    width: int
    image_inr: INRSpec
    motion_inr: INRSpec
    # Statics: device arrays that jitted callers MUST receive as arguments
    # (never closure constants — see models/inr.py statics discipline).
    statics: Any
    # Coarse-raster companion models, one per coarse_phases(cfg) entry in
    # coarse-to-fine order (same parameter trees via models/inr.py
    # param_shape; phase i's statics ride along under statics[f"coarse{i}"]).
    # Empty when coarse-to-fine is off.
    coarse_levels: Tuple["IMMoCoModel", ...] = ()

    @property
    def coarse(self) -> Optional["IMMoCoModel"]:
        """First (coarsest) companion, or None — single-level back-compat."""
        return self.coarse_levels[0] if self.coarse_levels else None

    @property
    def _warp_dtype(self):
        """One warp compute dtype for BOTH the joint-phase sampling matmuls
        and the frozen-tail precomputed weights — a joint/frozen dtype
        mismatch would put a numeric discontinuity in the loss at every
        phase boundary (and every duty-cycle flip)."""
        return (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )

    def init(self, key) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {"image": self.image_inr.init(k1), "motion": self.motion_inr.init(k2)}

    def predict_image(self, params, statics) -> jnp.ndarray:
        if self.image_inr.apply_cf is not None:
            # Channel-first: (2, H, W) -> complex with no trailing-dim-2
            # full-size intermediate (TPU lane padding; see apply_mlp_cf).
            pair = self.image_inr.apply_cf(params["image"], statics["image"])
            return jax.lax.complex(pair[0], pair[1])
        pair = self.image_inr.apply(params["image"], statics["image"])
        return jax.lax.complex(pair[..., 0], pair[..., 1])

    def sample_grids(self, params, masks, statics, with_motion=False):
        """Motion half of :meth:`forward`: the per-movement sampling grids.

        Returns ``(grids, gx, gy, mot)`` — channel-last grids
        (M, H, W, 2) with ``gx``/``gy`` None on the channel-last path, or
        ``grids`` None with channel-first planes (M, H, W) on the cf path;
        ``mot`` is the motion-stats dict (see forward) or None.  ``masks``
        are only consumed by the stats weighting."""

        def motion_stats(dx, dy):
            # dx/dy: (M, mh, mw) normalized displacements; px via the FULL
            # raster extent (normalized units are raster-relative).
            w_m = jnp.clip(masks.sum(axis=(-2, -1)), 0.0, 1.0)
            sq = (dx * dx + dy * dy).mean(axis=(-2, -1))  # (M,)
            l2 = (sq * w_m).sum() / jnp.maximum(w_m.sum(), 1.0)
            mag_px = jnp.sqrt(
                (dx * (self.width / 2.0)) ** 2 + (dy * (self.height / 2.0)) ** 2
            ).mean(axis=(-2, -1))
            return {"l2": l2, "px_mean": mag_px}

        mot = None
        cf = self.motion_inr.apply_cf is not None
        if cf:
            # Channel-first motion path: every full-size intermediate is a
            # wide (M, H, W) plane — no (..., 2) trailing dims anywhere.
            disp_cf = jnp.tanh(
                self.motion_inr.apply_cf(params["motion"], statics["motion"])
            )  # (2, M, H, W): channel 0 = x, 1 = y (as grids[..., 0/1])
            if self.cfg.motion_disp_px is not None:
                scale_cf = jnp.asarray(
                    [
                        2.0 * self.cfg.motion_disp_px / self.width,
                        2.0 * self.cfg.motion_disp_px / self.height,
                    ],
                    jnp.float32,
                ).reshape(2, 1, 1, 1)
                disp_cf = disp_cf * scale_cf
            if with_motion:
                mot = motion_stats(disp_cf[0], disp_cf[1])
            if "motion_up" in statics:
                # motion_res_factor upsample: two interp matmuls
                # (2, M, mh, mw) -> (2, M, H, W); linear resample of the
                # bounded displacement field (config.py motion_res_factor).
                uh, uw = statics["motion_up"]
                disp_cf = jnp.einsum("cmpq,jq->cmpj", disp_cf, uw)
                disp_cf = jnp.einsum("cmpj,ip->cmij", disp_cf, uh)
            grids_cf = disp_cf + statics["id_grid_cf"][:, None]
            gx, gy = grids_cf[0], grids_cf[1]
            grids = None
        else:
            disp = jnp.tanh(
                self.motion_inr.apply(params["motion"], statics["motion"])
            )
            if self.cfg.motion_disp_px is not None:
                # Bounded displacement: +-motion_disp_px pixels instead of
                # the full +-1 normalized range (banded-warp prerequisite;
                # protocol motions stay well inside the bound).
                scale = jnp.asarray(
                    [
                        2.0 * self.cfg.motion_disp_px / self.width,
                        2.0 * self.cfg.motion_disp_px / self.height,
                    ],
                    jnp.float32,
                )
                disp = disp * scale
            if with_motion:
                mot = motion_stats(disp[..., 0], disp[..., 1])
            if "motion_up" in statics:
                uh, uw = statics["motion_up"]
                disp = jnp.einsum("mpqc,jq->mpjc", disp, uw)
                disp = jnp.einsum("mpjc,ip->mijc", disp, uh)
            grids = disp + statics["id_grid"][None]
        return grids, (None if grids is not None else gx), (
            None if grids is not None else gy
        ), mot

    def forward(self, params, masks: jnp.ndarray, statics, with_motion=False):
        """masks: (max_movements, H, W) float32, zero-padded group masks.

        Returns (kspace_out, image) exactly as immoco.py:82-113.  With the
        static flag ``with_motion`` additionally returns a motion-stats dict
        computed on the displacement lattice (before any motion_res_factor
        upsample — the upsample is a linear interp, so lattice statistics
        track the full field):

          "l2":      mean over real movement groups (mask row non-empty) of
                     the squared normalized displacement — the
                     cfg.lambda_motion penalty term;
          "px_mean": (max_movements,) per-group mean |displacement| in
                     pixels — the cfg.dc_motion_gate_px gate input.
        """
        image = self.predict_image(params, statics)
        grids, gx, gy, mot = self.sample_grids(
            params, masks, statics, with_motion=with_motion
        )
        cf = grids is None

        def _grids_cl():
            # Channel-last grids for warp impls without a planes entry.
            if grids is not None:
                return grids
            return jnp.stack([gx, gy], axis=-1)

        m = masks.shape[0]
        if self.cfg.warp_impl == "matmul":
            # MXU path: bilinear sampling as one-hot matmuls; identical
            # semantics to grid_sample(bilinear, zeros, align_corners=False)
            # with a scatter-free backward (ops/warp_mm.py).
            motion_images = bilinear_sample_mm(
                image, _grids_cl(), align_corners=False,
                band_px=self.cfg.warp_band_px,
                tile_px=self.cfg.warp_tile_px,
                compute_dtype=self._warp_dtype,
            )
        elif self.cfg.warp_impl == "pallas_tiled":
            from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                bilinear_sample_tiled_pallas,
            )

            tile = self.cfg.warp_pallas_tile_px
            win = self.cfg.warp_pallas_win_px or 2 * tile
            # Shrunken windows can exceed small coarse rasters; fall back to
            # the 2*tile geometry there (still bounded by the same cap).
            win = min(win, 2 * tile)
            cap_max = (win - tile) // 2 - 2
            if (
                self.cfg.motion_disp_px is None
                or self.cfg.motion_disp_px > cap_max
            ):
                raise ValueError(
                    "warp_impl='pallas_tiled' requires motion_disp_px <= "
                    f"(win - tile)/2 - 2 = {cap_max} (got "
                    f"{self.cfg.motion_disp_px}); the window only covers "
                    "displacements within that bound"
                )
            if cf:
                from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                    bilinear_sample_tiled_pallas_planes,
                )

                motion_images = bilinear_sample_tiled_pallas_planes(
                    image, gy, gx, align_corners=False, tile_px=tile,
                    win_px=win,
                    xla_hats=self.cfg.warp_pallas_xla_hats,
                )
            else:
                motion_images = bilinear_sample_tiled_pallas(
                    image, grids, align_corners=False, tile_px=tile,
                    win_px=win,
                )
        elif self.cfg.warp_impl == "pallas":
            from miccai24_immoco_tpu.ops.warp_pallas import (
                bilinear_sample_pallas,
            )

            motion_images = bilinear_sample_pallas(
                image, _grids_cl(), align_corners=False
            )
        else:
            motion_images = grid_sample(
                jnp.broadcast_to(
                    image[None, None], (m, 1, self.height, self.width)
                ),
                _grids_cl(),
                mode="bilinear",
                padding_mode="zeros",
                align_corners=False,
            )[:, 0]  # (M, H, W) complex

        k_out = self.compose_kspace(image, motion_images, masks, statics)
        if with_motion:
            return k_out, image, mot
        return k_out, image

    def compose_kspace(self, image, motion_images, masks, statics):
        """Mask-composed k-space operator (immoco.py:109-111):
        FFT(image)·(1−Σmasks) + Σ FFT(motion_images)·masks."""
        if self.cfg.kspace_op == "dft_mm":
            # Centered DFT as MXU matmuls (ops/dft.py): XLA's TPU FFT is the
            # slower lowering for these shapes, and the matmul autodiff keeps
            # the backward FFT-free too.
            kfn = lambda x: fft2c_mm(x, statics["dft"])  # noqa: E731
        else:
            kfn = fft2c
        # Round-5 note: an optimization_barrier between the movement FFTs
        # and the mask-sum cures a 38.7->2.2 ms pathological backward
        # fusion in UNSCANNED compositions (scripts/probe_compose_fix.py)
        # but is perf-NEUTRAL inside the scanned fit (ablate two-length
        # marginals 50.6 vs 50.6) while perturbing the tuned 115-iter
        # bench at the 1e-3 ssim level via downstream fusion-order
        # changes.  Production fits are all scanned, so the barrier is
        # NOT installed here; eval-path authors composing warp->fft->
        # mask-sum vjps OUTSIDE a scan should barrier locally.
        dc_term = kfn(image) * (1.0 - masks.sum(0))
        mov_term = (kfn(motion_images) * masks).sum(0)
        return dc_term + mov_term

    def frozen_warp_weights(self, params, masks, statics):
        """Precompute tiled warp weights from the CURRENT motion params
        (cfg.motion_freeze_iters); gradients are cut so the frozen phase
        treats them as constants.  warp_impl='pallas_tiled' uses the
        apply-only Pallas kernel geometry (warp_tiled_frozen_weights, tile
        = warp_pallas_tile_px — bit-identical to the fused kernel);
        everything else uses the XLA tiled weights
        (ops/warp_mm.bilinear_weights_tiled, tile = motion_freeze_tile_px)."""
        grids, gx, gy, _ = self.sample_grids(params, masks, statics)
        if self.cfg.warp_impl == "pallas_tiled":
            from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                warp_tiled_frozen_weights,
            )

            if grids is not None:
                gx, gy = grids[..., 0], grids[..., 1]
            return warp_tiled_frozen_weights(
                jax.lax.stop_gradient(gy), jax.lax.stop_gradient(gx),
                self.height, self.width,
                tile_px=self.cfg.warp_pallas_tile_px,
                win_px=min(
                    self.cfg.warp_pallas_win_px
                    or 2 * self.cfg.warp_pallas_tile_px,
                    2 * self.cfg.warp_pallas_tile_px,
                ),
                align_corners=False,
            )
        from miccai24_immoco_tpu.ops.warp_mm import bilinear_weights_tiled

        # Same windowed-weights validity condition as the fused pallas
        # entry: each 3*tile window only covers displacements up to
        # tile_px - 1, and bilinear_weights_tiled validates shapes, not the
        # bound — an unbounded motion field would silently clamp warps in
        # the frozen tail while the joint phase (dense one-hots, exact for
        # any displacement) did not.
        tile = self.cfg.motion_freeze_tile_px
        if (
            self.cfg.motion_disp_px is None
            or self.cfg.motion_disp_px > tile - 1
        ):
            raise ValueError(
                "motion_freeze_iters/motion_duty with warp_impl="
                f"'{self.cfg.warp_impl}' requires motion_disp_px <= "
                f"motion_freeze_tile_px - 1 = {tile - 1} (got "
                f"{self.cfg.motion_disp_px}); the tiled frozen weights "
                "clamp displacements beyond their 3*tile window"
            )
        if grids is None:
            grids = jnp.stack([gx, gy], axis=-1)
        return bilinear_weights_tiled(
            jax.lax.stop_gradient(grids), self.height, self.width,
            tile_px=tile, align_corners=False,
            compute_dtype=self._warp_dtype,
        )

    def forward_frozen(self, params_image, warp_wts, masks, statics):
        """Forward model with FROZEN motion: precomputed warp weights stand
        in for the Motion INR + hat-weight build (pure-MXU applies both
        directions).  Takes only the Image INR's params; returns
        (kspace_out, image) like :meth:`forward`."""
        image = self.predict_image({"image": params_image}, statics)
        if self.cfg.warp_impl == "pallas_tiled":
            from miccai24_immoco_tpu.ops.warp_tiled_pallas import (
                warp_tiled_frozen_apply,
            )

            motion_images = warp_tiled_frozen_apply(image, warp_wts)
        else:
            from miccai24_immoco_tpu.ops.warp_mm import bilinear_apply_tiled

            motion_images = bilinear_apply_tiled(image, warp_wts)
        return self.compose_kspace(image, motion_images, masks, statics), image


def _upsample_matrix(n: int, m: int) -> jnp.ndarray:
    """(n, m) row-stochastic linear-interp matrix: target linspace(-1,1,n)
    sampled from a source linspace(-1,1,m) lattice (hat weights).

    Delegates to ops/lattice._interp_matrix — the motion-raster upsample
    MUST use the same per-axis lerp convention as the lattice encoding plan
    it composes with (element-identical; a second implementation here had
    already reproduced it independently)."""
    from miccai24_immoco_tpu.ops.lattice import _interp_matrix

    return jnp.asarray(_interp_matrix(n, m))


def coarse_hw(
    cfg: InstanceFitConfig, height: int, width: int, size: Optional[int] = None
) -> Tuple[int, int]:
    """Coarse raster for a c2f phase: ``size`` (default cfg.coarse_size), or
    the largest warp-tile multiple <= 0.6 * extent.  Both axes use the SAME
    ratio so the normalized displacement bound (2 * disp_px / extent)
    transfers exactly."""
    tile = (cfg.warp_pallas_tile_px if cfg.warp_impl == "pallas_tiled"
            else 32)
    size = cfg.coarse_size if size is None else size
    if size:
        hc = int(size)
    else:
        hc = max((int(0.6 * height) // tile) * tile, tile)
    wc = hc * width // height
    if wc * height != hc * width:
        raise ValueError(
            f"coarse raster {hc} does not preserve the {height}x{width} "
            "aspect ratio (displacement-bound transfer requires hc/H == wc/W)"
        )
    f = max(int(cfg.motion_res_factor), 1)
    if hc % f or wc % f or (height - hc) % 2 or (width - wc) % 2:
        raise ValueError(
            f"coarse raster ({hc}, {wc}) must be motion_res_factor-divisible "
            "with an even crop margin"
        )
    if cfg.warp_impl == "pallas_tiled" and (hc % tile or wc % tile):
        raise ValueError(
            f"coarse raster ({hc}, {wc}) must be divisible by "
            f"warp_pallas_tile_px={tile} for warp_impl='pallas_tiled'"
        )
    return hc, wc


def _coarse_crop(
    model: "IMMoCoModel", cm: "IMMoCoModel", k_in: jnp.ndarray,
    masks: jnp.ndarray,
):
    """Center-crop normalized k-space + movement masks to ``cm``'s raster.

    The sqrt(area-ratio) factor makes the coarse ortho-IFFT image carry the
    SAME pixel amplitudes as the full-resolution image (for a band-limited
    image under centered ortho DFTs, K_coarse ~= K_full *
    sqrt(hc*wc / (H*W)) on the shared low frequencies), so the Image INR's
    parameters transfer across the raster switch without an amplitude jump.
    """
    dh = (model.height - cm.height) // 2
    dw = (model.width - cm.width) // 2
    ratio = float(
        np.sqrt((cm.height * cm.width) / (model.height * model.width))
    )
    k_c = k_in[dh : dh + cm.height, dw : dw + cm.width] * ratio
    m_c = masks[:, dh : dh + cm.height, dw : dw + cm.width]
    return k_c, m_c


def _coarse_lambda_scale(model: "IMMoCoModel", cm: "IMMoCoModel") -> float:
    """GE is an unnormalized pixel sum while the data term is a mean
    (ops/losses.py), so a coarse stage scales lambda by the pixel-count
    ratio to preserve the prior/data balance (config.py coarse_iters)."""
    return (model.height * model.width) / float(cm.height * cm.width)


def _scale_coarse_sched(sched: np.ndarray, lam_scale: float) -> np.ndarray:
    """Apply the coarse-stage lambda scale to a fit_schedule slice (the
    lambda column only — EMA betas, if present, pass through)."""
    sched = np.array(sched, copy=True)
    if sched.ndim == 2:
        sched[:, 0] *= lam_scale
    else:
        sched *= lam_scale
    return sched


def phase_spans(cfg: InstanceFitConfig):
    """[(start, end, phase_idx)] iteration spans of a (possibly c2f) fit:
    one span per coarse_phases(cfg) entry (phase_idx = its index), the
    full-resolution joint remainder (phase_idx = -1, duty-cycled into
    alternating joint/frozen sub-spans when cfg.motion_duty is set), then
    the trailing motion-frozen span (phase_idx = -2) when
    cfg.motion_freeze_iters > 0."""
    spans, s = [], 0
    for i, (it, _sz) in enumerate(coarse_phases(cfg)):
        spans.append((s, s + it, i))
        s += it
    if s < cfg.iters:
        fz = min(max(int(cfg.motion_freeze_iters), 0), cfg.iters - s)
        joint_end = cfg.iters - fz
        if joint_end > s:
            if cfg.motion_duty:
                # Duty-cycled joint span (cfg.motion_duty = (j, f)):
                # alternate j joint iterations with f motion-frozen ones.
                # Always starts AND ends with a joint sub-span so the
                # motion field is fresh entering the frozen tail.
                # cfg.motion_duty_start plain joint iterations run first
                # (late-start duty — the early full-res iterations need
                # every motion update, config.py rationale).
                j, f = (max(int(v), 1) for v in cfg.motion_duty)
                t = s
                lead = min(max(int(cfg.motion_duty_start), 0), joint_end - t)
                if lead:
                    spans.append((t, t + lead, -1))
                    t += lead
                while t < joint_end:
                    if t + j + f >= joint_end:
                        # No room for a full cycle plus a trailing joint
                        # entry: run joint to the end of the span.
                        spans.append((t, joint_end, -1))
                        t = joint_end
                    else:
                        spans.append((t, t + j, -1))
                        spans.append((t + j, t + j + f, -2))
                        t += j + f
            else:
                spans.append((s, joint_end, -1))
        if fz:
            spans.append((joint_end, cfg.iters, -2))
    return spans


def fit_windows(cfg: InstanceFitConfig, segment_len: int):
    """[(start, end, phase_idx)] segment windows for a (possibly c2f) fit:
    each phase_spans() span chopped into <= segment_len runs; phase
    boundaries never straddle a segment.  phase_idx indexes
    model.coarse_levels; -1 = the full-resolution phase."""
    out = []
    for a, b, phase in phase_spans(cfg):
        s = a
        while s < b:
            e = min(s + segment_len, b)
            out.append((s, e, phase))
            s = e
    return out


def build_immoco(
    cfg: InstanceFitConfig,
    height: int,
    width: int,
    _param_hw: Optional[Tuple[int, int]] = None,
) -> IMMoCoModel:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    f = max(int(cfg.motion_res_factor), 1)
    mh, mw = height // f, width // f
    image_inr = build_inr(
        cfg.image_inr, (height, width), compute_dtype=dtype,
        param_shape=_param_hw,
    )
    motion_inr = build_inr(
        cfg.motion_inr, (cfg.max_movements, mh, mw), compute_dtype=dtype,
        param_shape=(
            None if _param_hw is None
            else (cfg.max_movements, _param_hw[0] // f, _param_hw[1] // f)
        ),
    )
    id_grid = jax.jit(identity_grid, static_argnums=(0, 1))(
        (height, width), True
    )
    statics = {
        "image": image_inr.statics,
        "motion": motion_inr.statics,
        "id_grid": id_grid,
        # Channel-first planes (2, H, W) for the cf motion path.
        "id_grid_cf": jax.jit(lambda g: jnp.moveaxis(g, -1, 0))(id_grid),
    }
    if f > 1:
        # (H, mh)/(W, mw) bilinear-resample matrices from the coarse motion
        # lattice (linspace(-1,1,m), inr._lattice_coords convention) to the
        # full pixel lattice — the cfg.motion_res_factor upsample.
        statics["motion_up"] = (
            _upsample_matrix(height, mh),
            _upsample_matrix(width, mw),
        )
    if cfg.kspace_op == "dft_mm":
        statics["dft"] = centered_dft_statics(height, width)
    coarse_levels = []
    if _param_hw is None:
        prev_hc = 0
        for pi, (_it, sz) in enumerate(coarse_phases(cfg)):
            hc, wc = coarse_hw(cfg, height, width, sz)
            if hc <= prev_hc or hc >= height:
                raise ValueError(
                    "coarse_schedule sizes must be strictly increasing and "
                    f"< the full extent (phase {pi}: {hc} vs prev {prev_hc},"
                    f" full {height})"
                )
            prev_hc = hc
            ccfg = dataclasses.replace(
                cfg,
                coarse_iters=0,
                coarse_schedule=(),
                # Same NORMALIZED displacement bound: the tanh scale in
                # forward is 2 * disp_px / extent, so the pixel cap shrinks
                # with the raster (coarse_hw guarantees hc/H == wc/W).
                motion_disp_px=(
                    None
                    if cfg.motion_disp_px is None
                    else cfg.motion_disp_px * hc / height
                ),
            )
            cm = build_immoco(ccfg, hc, wc, _param_hw=(height, width))
            coarse_levels.append(cm)
            statics[f"coarse{pi}"] = cm.statics
    return IMMoCoModel(
        cfg=cfg,
        height=height,
        width=width,
        image_inr=image_inr,
        motion_inr=motion_inr,
        statics=statics,
        coarse_levels=tuple(coarse_levels),
    )


def _joint_loss(cfg, fwd_model, k_target, masks, st):
    """Joint-phase fit loss: k-space data consistency + λ·gradient-entropy
    (+ optional displacement L2) — the one loss every fit variant optimizes
    (reference immoco.py:145-176)."""

    def loss_fn(p, lam, lam_m=None):
        if cfg.lambda_motion > 0:
            k_out, image, mot = fwd_model.forward(
                p, masks, st, with_motion=True
            )
            # lam_m: per-iteration annealed weight (fit_schedule column,
            # config.py lambda_motion_anneal_frac); None = constant.
            w = cfg.lambda_motion if lam_m is None else lam_m
            return (
                real_pair_mse(k_out, k_target)
                + lam * gradient_entropy(image)
                + w * mot["l2"]
            )
        k_out, image = fwd_model.forward(p, masks, st)
        return real_pair_mse(k_out, k_target) + lam * gradient_entropy(image)

    return loss_fn


def _frozen_loss(model, wts, k_in, masks, statics):
    """Motion-frozen phase loss: Image INR only, warp applied via the
    precomputed tiled weights.  The lambda_motion term is constant here
    (motion fixed) so it is omitted — its gradient is zero either way."""

    def loss_fn(p_img, lam, lam_m=None):
        del lam_m  # motion fixed -> the annealed term is a constant
        k_out, image = model.forward_frozen(p_img, wts, masks, statics)
        return real_pair_mse(k_out, k_in) + lam * gradient_entropy(image)

    return loss_fn


def _make_scan_step(opt, loss_fn, use_ema, cp=lambda p: p,
                    freeze_motion=False, use_lam_motion=False):
    """The one Adam/EMA scan-step body shared by every fit variant
    (single-scan and segmented, joint/coarse/frozen phases) — four hand-
    maintained copies of this had already drifted subtly.

    carry = (params, opt_state[, ema]); x = lam or the fit_schedule row
    [lam, ema_beta?, lam_motion?] (use_lam_motion reads x[-1]).
    ``cp``: sharding-constraint hook re-applied after each update
    (parallel/sharded_fit.tp_constraints; identity otherwise).
    ``freeze_motion``: gradients taken for params["image"] only, and the
    motion update zeroed so the motion params are EXACTLY frozen (Adam
    moments for motion keep decaying on zero grads)."""
    zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)

    def step(carry, x):
        if use_ema:
            p, s, e = carry
        else:
            p, s = carry
        if use_ema or use_lam_motion:
            lam = x[0]
            beta = x[1] if use_ema else None
            lam_m = x[-1] if use_lam_motion else None
        else:
            lam = x
            lam_m = None
        if freeze_motion:
            loss, g_img = jax.value_and_grad(loss_fn)(p["image"], lam, lam_m)
            grads = {"image": g_img, "motion": zeros_like(p["motion"])}
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p, lam, lam_m)
        updates, s = opt.update(grads, s)
        if freeze_motion:
            updates = {
                "image": updates["image"],
                "motion": zeros_like(updates["motion"]),
            }
        p = cp(optax.apply_updates(p, updates))
        if use_ema:
            e = jax.tree_util.tree_map(
                lambda a, b: beta * a + (1.0 - beta) * b, e, p
            )
            return (p, s, e), loss
        return (p, s), loss

    return step


def make_instance_fit(
    model: IMMoCoModel,
    constrain_params: Optional[Callable] = None,
    constrain_masks: Optional[Callable] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray, jax.Array], FitResult]:
    """Build the jittable single-slice fit:
    (kspace, masks, key, statics) -> FitResult.

    kspace: (H, W) complex64 corrupted k-space.
    masks:  (max_movements, H, W) float32 zero-padded movement-group masks.
    statics: model.statics, threaded as an argument (jit-friendly).

    constrain_params / constrain_masks: optional GSPMD sharding-constraint
    hooks (see parallel/sharded_fit.tp_constraints) applied to the INR
    parameters (at init and after every optimizer update, so the layout is
    stable across the scan) and to the movement-group masks.  They implement
    tensor parallelism over the movement axis: with masks and the Motion
    INR's movement-leading lattice grids sharded over tp, GSPMD partitions
    the per-movement warp matmuls + FFTs and inserts one psum for the
    mask-composed k-space sum.
    """
    cfg = model.cfg
    sched_np = fit_schedule(cfg)
    # One scaled schedule slice per phase span (coarse lambdas carry the
    # pixel-count scale of their raster).
    phase_scheds = []
    for s, e, pi in phase_spans(cfg):
        seg = sched_np[s:e]
        if pi >= 0:
            seg = _scale_coarse_sched(
                seg, _coarse_lambda_scale(model, model.coarse_levels[pi])
            )
        phase_scheds.append((pi, jnp.asarray(seg)))
    use_ema = cfg.ema_decay > 0
    use_lm = use_lam_motion_col(cfg)
    opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
    cp = constrain_params or (lambda p: p)
    cm = constrain_masks or (lambda m: m)

    def fit(kspace, masks, key, statics) -> FitResult:
        scale = jnp.abs(kspace).max()
        k_in = kspace / scale * cfg.kspace_scale
        masks = cm(masks)

        params = cp(model.init(key))
        opt_state = opt.init(params)

        carry = (params, opt_state, params) if use_ema else (params, opt_state)
        loss_segs = []
        for pi, sched_p in phase_scheds:
            if pi >= 0:
                # Coarse phase: same params/optimizer, center-cropped
                # k-space on phase pi's raster (config.py coarse_schedule).
                cmod = model.coarse_levels[pi]
                k_p, m_p = _coarse_crop(model, cmod, k_in, masks)
                loss_fn = _joint_loss(cfg, cmod, k_p, m_p, statics[f"coarse{pi}"])
                step = _make_scan_step(opt, loss_fn, use_ema, cp=cp,
                                       use_lam_motion=use_lm)
            elif pi == -2:
                # Weights built once from the phase-entry motion params —
                # hoisted out of the scan by construction.
                wts = model.frozen_warp_weights(carry[0], masks, statics)
                loss_fn = _frozen_loss(model, wts, k_in, masks, statics)
                step = _make_scan_step(
                    opt, loss_fn, use_ema, cp=cp, freeze_motion=True,
                    use_lam_motion=use_lm,
                )
            else:
                loss_fn = _joint_loss(cfg, model, k_in, masks, statics)
                step = _make_scan_step(opt, loss_fn, use_ema, cp=cp,
                                       use_lam_motion=use_lm)
            carry, l_p = jax.lax.scan(step, carry, sched_p)
            loss_segs.append(l_p)
        losses = (
            jnp.concatenate(loss_segs) if len(loss_segs) > 1 else loss_segs[0]
        )
        params = carry[2] if use_ema else carry[0]

        k_fwd, image, mot = _forward_final(model, params, masks, statics)
        image = _finalize_image(model, image, k_in, masks, statics, mot)
        descale = scale / cfg.kspace_scale
        return FitResult(
            image=image * descale, kspace_forward=k_fwd * descale, losses=losses
        )

    return fit


def _forward_final(model, params, masks, statics):
    """Final forward pass of a fit: (k_fwd, image, motion-stats-or-None) —
    motion stats only when the dc_motion_gate_px gate will consume them."""
    if model.cfg.dc_replace and model.cfg.dc_motion_gate_px > 0:
        return model.forward(params, masks, statics, with_motion=True)
    k_fwd, image = model.forward(params, masks, statics)
    return k_fwd, image, None


def _finalize_image(model, image, k_in, masks, statics, mot):
    """Output-stage corrections shared by every fit variant, in order:

    1. cfg.recenter_max_px — undo the degenerate common-mode shift via
       phase correlation against the measured identity columns
       (ops/recenter.py; no-op when the gate is 0).
    2. cfg.dc_replace — hard data-consistency projection (_dc_project).

    Recentering runs first so the projection mixes ALIGNED INR content
    with the measured columns instead of ghosting a shifted copy."""
    cfg = model.cfg
    if cfg.recenter_max_px > 0:
        from miccai24_immoco_tpu.ops.recenter import recenter_to_identity

        ident = jnp.clip(1.0 - masks.sum(0), 0.0, 1.0)
        image, _, _ = recenter_to_identity(
            k_in, image, ident, cfg.recenter_max_px
        )
    if cfg.dc_replace:
        image = _dc_project(model, image, k_in, masks, statics, mot)
    return image


def _dc_project(model, image, k_in, masks, statics, mot=None):
    """Hard data-consistency projection (cfg.dc_replace, see config.py):
    keep the measured spectrum on uncorrupted columns, the INR's on
    corrupted ones, and return the corresponding image (same scale as
    ``image``/``k_in``).

    With motion stats ``mot`` (cfg.dc_motion_gate_px > 0), groups whose
    fitted mean |displacement| is below the gate are treated as uncorrupted
    too: sub-pixel motion ghosts less than INR smoothing costs, so their
    measured columns are kept (config.py dc_motion_gate_px)."""
    from miccai24_immoco_tpu.ops.fft import ifft2c

    if model.cfg.kspace_op == "dft_mm":
        kfn = lambda x: fft2c_mm(x, statics["dft"])  # noqa: E731
    else:
        kfn = fft2c
    if mot is not None:
        moving = (
            mot["px_mean"] >= model.cfg.dc_motion_gate_px
        ).astype(masks.dtype)
        corrupted = jnp.clip(
            (masks * moving[:, None, None]).sum(0), 0.0, 1.0
        )
    else:
        corrupted = jnp.clip(masks.sum(0), 0.0, 1.0)
    k_dc = k_in * (1.0 - corrupted) + kfn(image) * corrupted
    return ifft2c(k_dc)


def make_image_fit(model: IMMoCoModel):
    """Image-INR-only fit: pure FFT data-consistency to a (motion-free)
    k-space, no motion model (BASELINE.json config 1 — the smallest end-to-
    end slice of the stack).  (kspace, key, statics) -> FitResult."""
    cfg = model.cfg
    lambdas = jnp.asarray(lambda_schedule(cfg))
    opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)

    def fit(kspace, key, statics) -> FitResult:
        scale = jnp.abs(kspace).max()
        k_in = kspace / scale * cfg.kspace_scale
        params = model.init(key)
        opt_state = opt.init(params)

        def loss_fn(p, lam):
            image = model.predict_image(p, statics)
            return real_pair_mse(fft2c(image), k_in) + lam * gradient_entropy(
                image
            )

        def step(carry, lam):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, lam)
            updates, s = opt.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), lambdas)
        image = model.predict_image(params, statics)
        descale = scale / cfg.kspace_scale
        return FitResult(
            image=image * descale,
            kspace_forward=fft2c(image) * descale,
            losses=losses,
        )

    return fit


def make_segmented_fit(model: IMMoCoModel, segment_len: int = 25):
    """Segmented variant of the instance fit for runtimes that bound
    single-program execution time (e.g. tunneled/preemptible TPUs).

    One compiled graph advances (params, opt_state) by ``segment_len``
    iterations; the host loops segments, reusing the same executable.
    Numerically identical to make_instance_fit (same scan body, same Adam
    state threading).

    Returns ``run`` with attached pieces:
      run.init_fn(kspace, key, statics) -> (params, opt_state, k_in, scale)
      run.segment_fn(params, opt_state, k_in, masks, sched_seg, statics)
          -> (params, opt_state, losses_seg)      [full-resolution phase]
      run.phase_segment_fns[i]                    [coarse_levels[i] phase]
      run.finalize_fn(params, k_in, masks, scale, statics) -> FitResult-less
          tuple (image, kspace_forward) at input scale

    With cfg.ema_decay > 0 the ``params`` slot is a {"p", "e"} dict (iterate
    + EMA, threaded opaquely by batched callers) and ``sched_seg`` rows are
    [lambda, ema_beta] pairs (fit_schedule).
    """
    cfg = model.cfg
    use_ema = cfg.ema_decay > 0
    use_lm = use_lam_motion_col(cfg)
    opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)

    @jax.jit
    def init_fn(kspace, key, statics):
        scale = jnp.abs(kspace).max()
        k_in = kspace / scale * cfg.kspace_scale
        params = model.init(key)
        state = {"p": params, "e": params} if use_ema else params
        return state, opt.init(params), k_in, scale

    def _make_segment(phase: int):
        # phase: coarse_levels index, -1 for the full-resolution joint
        # phase, or -2 for the trailing motion-frozen phase.
        if phase == -2:
            return _make_frozen_segment()
        fwd_model = model.coarse_levels[phase] if phase >= 0 else model

        @jax.jit
        def segment_fn(params, opt_state, k_in, masks, sched_seg, statics):
            if phase >= 0:
                k_in, masks = _coarse_crop(model, fwd_model, k_in, masks)
                st = statics[f"coarse{phase}"]
            else:
                st = statics

            step = _make_scan_step(
                opt, _joint_loss(cfg, fwd_model, k_in, masks, st), use_ema,
                use_lam_motion=use_lm,
            )
            carry0 = ((params["p"], opt_state, params["e"]) if use_ema
                      else (params, opt_state))
            carry, losses = jax.lax.scan(step, carry0, sched_seg)
            state = ({"p": carry[0], "e": carry[2]} if use_ema else carry[0])
            return state, carry[1], losses

        return segment_fn

    def _make_frozen_segment():
        # Motion-frozen tail segment (cfg.motion_freeze_iters): the warp
        # weights are built ONCE per segment from the (constant) motion
        # params — outside the scan, so the hat-weight VPU cost is paid per
        # segment, not per iteration — and each iteration optimizes the
        # Image INR alone through pure-MXU weight applies.  Bit-identical
        # to make_instance_fit's frozen phase: the motion params never
        # change, so per-segment weight rebuilds yield identical weights.
        @jax.jit
        def frozen_segment_fn(params, opt_state, k_in, masks, sched_seg,
                              statics):
            p0 = params["p"] if use_ema else params
            wts = model.frozen_warp_weights(p0, masks, statics)

            step = _make_scan_step(
                opt, _frozen_loss(model, wts, k_in, masks, statics), use_ema,
                freeze_motion=True, use_lam_motion=use_lm,
            )
            carry0 = ((params["p"], opt_state, params["e"]) if use_ema
                      else (params, opt_state))
            carry, losses = jax.lax.scan(step, carry0, sched_seg)
            state = ({"p": carry[0], "e": carry[2]} if use_ema else carry[0])
            return state, carry[1], losses

        return frozen_segment_fn

    segment_fn = _make_segment(-1)
    frozen_segment_fn = (
        _make_segment(-2)
        if (cfg.motion_freeze_iters > 0 or cfg.motion_duty)
        else None
    )
    phase_segment_fns = tuple(
        _make_segment(pi) for pi in range(len(model.coarse_levels))
    )

    def _phase_fn(phase: int):
        if phase >= 0:
            return phase_segment_fns[phase]
        return frozen_segment_fn if phase == -2 else segment_fn

    @jax.jit
    def finalize_fn(params, k_in, masks, scale, statics):
        k_fwd, image, mot = _forward_final(
            model, params["e"] if use_ema else params, masks, statics
        )
        image = _finalize_image(model, image, k_in, masks, statics, mot)
        descale = scale / cfg.kspace_scale
        return image * descale, k_fwd * descale

    lam_scales = tuple(
        _coarse_lambda_scale(model, cm) for cm in model.coarse_levels
    )

    def run(kspace, masks, key, statics) -> FitResult:
        lambdas = fit_schedule(cfg)
        # Padded tail segments would perturb params; instead fit_windows
        # yields full segments plus short remainders (each distinct
        # (length, phase) pair compiles once).
        params, opt_state, k_in, scale = init_fn(kspace, key, statics)
        losses = []
        for s, e, phase in fit_windows(cfg, segment_len):
            seg = lambdas[s:e]
            if phase >= 0:
                seg = _scale_coarse_sched(seg, lam_scales[phase])
            fn = _phase_fn(phase)
            params, opt_state, l = fn(
                params, opt_state, k_in, masks, jnp.asarray(seg), statics
            )
            losses.append(l)
        image, k_fwd = finalize_fn(params, k_in, masks, scale, statics)
        return FitResult(
            image=image,
            kspace_forward=k_fwd,
            losses=jnp.concatenate(losses) if losses else jnp.zeros((0,)),
        )

    run.init_fn = init_fn
    run.segment_fn = segment_fn
    run.frozen_segment_fn = frozen_segment_fn
    run.phase_fn = _phase_fn
    run.phase_segment_fns = phase_segment_fns
    # Single-level back-compat alias (first coarse phase, or None).
    run.coarse_segment_fn = phase_segment_fns[0] if phase_segment_fns else None
    run.finalize_fn = finalize_fn
    return run


_MOTION_CORRECT_CACHE: Dict[Any, Any] = {}


def motion_correct(
    kspace: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: InstanceFitConfig = InstanceFitConfig(),
    key: Optional[jax.Array] = None,
    segment_len: int = 50,
) -> FitResult:
    """One-call convenience API mirroring imcoco_motion_correction
    (immoco.py:116). Jits on first use per (H, W, cfg) combination.

    Runs as compiled segments (numerically identical to the single-graph
    scan; required on runtimes that bound per-program execution time).

    The (model, fit) pair is memoized per (H, W, cfg, segment_len): the fit
    closes over fresh ``jax.jit`` objects, so rebuilding it per call would
    retrace the multi-segment programs every time (per-slice eval loops paid
    minutes of pure tracing on the remote-compile runtime).
    """
    h, w = kspace.shape
    cache_key = (h, w, cfg, segment_len)
    cached = _MOTION_CORRECT_CACHE.get(cache_key)
    if cached is None:
        model = build_immoco(cfg, h, w)
        cached = (model, make_segmented_fit(model, segment_len=segment_len))
        _MOTION_CORRECT_CACHE[cache_key] = cached
    model, fit = cached
    if masks.shape[0] != cfg.max_movements:
        pad = cfg.max_movements - masks.shape[0]
        if pad < 0:
            raise ValueError(
                f"{masks.shape[0]} movement groups > max_movements={cfg.max_movements}"
            )
        masks = jnp.pad(masks.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    if key is None:
        key = jax.random.PRNGKey(0)
    return fit(kspace, masks.astype(jnp.float32), key, model.statics)
