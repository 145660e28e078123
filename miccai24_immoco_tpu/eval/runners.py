"""End-to-end method runners over frozen test corpora.

Each runner mirrors one reference evaluation script (SURVEY.md C22):

- ``run_immoco``        <- src/test/test_immoco.py: klD-Net mask inference ->
  movement-group extraction -> 200-iter instance fit -> quarter-crop metrics
- ``run_autofocusing``  <- src/test/test_autofocusing.py
- ``run_afplus``        <- src/test/test_afplus_original.py
- ``run_denoiser``      <- src/test/test_unet_denoiser.py
- ``run_kld``           <- src/test/test_klinedetect.py (mask quality)

All runners consume a corpus dict (data/fastmri_io.load_test_corpus format)
and return per-slice metric dicts; reporting goes through eval/harness.

Mask source: a trained klD-Net (pass net+params) or the corpus's stored
ground-truth masks ("oracle" mode — useful before a detector is trained and
for isolating correction quality from detection quality).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    AFPlusConfig,
    AutofocusingConfig,
    InstanceFitConfig,
)
from miccai24_immoco_tpu.eval.harness import METRIC_NAMES, _slice_metrics
from miccai24_immoco_tpu.models.af_plus import make_afplus_fit, make_afplus_fit_p
from miccai24_immoco_tpu.models.autofocusing import make_autofocus_fit
from miccai24_immoco_tpu.models.immoco import build_immoco, make_instance_fit
from miccai24_immoco_tpu.ops.fft import ifft2c
from miccai24_immoco_tpu.ops.losses import gradient_entropy
from miccai24_immoco_tpu.ops.masks import extract_movement_groups
from miccai24_immoco_tpu.train.train_kld import (
    mask_to_line_indicators,
    predict_line_mask,
)
from miccai24_immoco_tpu.utils.hostio import put_complex


def _restart_improves(prev: Optional[float], new: float) -> bool:
    """Best-of-K restart winner rule: lower selection score wins, and a
    non-finite score (diverged restart: NaN final loss / NaN-GE image) never
    displaces a finite earlier winner — the naive ``prev <= new`` guard let
    NaN candidates through because NaN comparisons are all False."""
    if prev is None:
        return True
    if not np.isfinite(new):
        return False
    return not (np.isfinite(prev) and prev <= new)


# Wall-clock attribution of the most recent run_immoco_batched call
# (detection / per-bucket build + first-vs-steady batch times); read by
# scripts/e2e_eval.py into the artifact meta (VERDICT r4 next #6).
LAST_TIMING: Dict[str, Any] = {}


def _metrics_dict(pred, gt) -> Dict[str, float]:
    vals = np.asarray(_slice_metrics(jnp.abs(pred), jnp.abs(gt)))
    return {k: float(v) for k, v in zip(METRIC_NAMES, vals)}


def _make_indicator_fn(kld: Optional[dict]):
    """Build a jitted (kspace, gt_mask_or_none) -> (W,) indicator fn.

    Jitted once per runner: on remote-compile runtimes every *eager* op
    round-trips the compiler, so the detector forward must be one graph.
    """
    if kld is None:
        return None

    net = kld["net"]

    @jax.jit
    def fn(params, kspace):
        mask = predict_line_mask(net, params, kspace[None])[0]
        return mask_to_line_indicators(mask)

    return lambda kspace: fn(kld["params"], kspace)


def _line_indicators(
    kspace: jnp.ndarray,
    gt_mask: Optional[np.ndarray],
    kld: Optional[dict],
    indicator_fn=None,
) -> jnp.ndarray:
    """(H, W) k-space -> (W,) corrupted-column indicators."""
    if indicator_fn is not None:
        return indicator_fn(kspace)
    if kld is not None:
        mask = predict_line_mask(kld["net"], kld["params"], kspace[None])[0]
        return mask_to_line_indicators(mask)
    if gt_mask is None:
        raise ValueError("need either a klD-Net or ground-truth masks")
    return jnp.asarray(gt_mask[0] > 0)


def run_immoco(
    corpus: dict,
    cfg: InstanceFitConfig = InstanceFitConfig(),
    kld: Optional[dict] = None,
    key: Optional[jax.Array] = None,
    limit: Optional[int] = None,
    collect_images: bool = False,
):
    """Returns (per-slice metrics list, optional images dict of last slice)."""
    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    masks_all = corpus.get("mask")
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    h, w = ks_all.shape[-2:]

    model = build_immoco(cfg, h, w)
    fit = jax.jit(make_instance_fit(model))
    if key is None:
        key = jax.random.PRNGKey(0)
    indicator_fn = _make_indicator_fn(kld)
    groups = jax.jit(
        lambda ind: extract_movement_groups(ind, h, cfg.max_movements)
    )

    metrics: List[Dict[str, float]] = []
    last_images = None
    for i in range(n):
        ksp = put_complex(ks_all[i])
        gt = put_complex(gt_all[i])
        ind = _line_indicators(
            ksp, None if masks_all is None else masks_all[i], kld,
            indicator_fn,
        )
        masks, _ = groups(ind)
        key, sub = jax.random.split(key)
        result = fit(ksp, masks, sub, model.statics)
        metrics.append(_metrics_dict(result.image, gt))
        if collect_images and i == n - 1:
            last_images = {
                "Motion corrupted image": np.abs(np.asarray(ifft2c(ksp).real))
                + 1j * 0,
                "Motion corrected image": np.abs(
                    np.asarray(jnp.abs(result.image))
                ),
                "Ground truth image": np.asarray(jnp.abs(gt)),
            }
    return metrics, last_images


def run_immoco_batched(
    corpus: dict,
    cfg: InstanceFitConfig = InstanceFitConfig(),
    kld: Optional[dict] = None,
    key: Optional[jax.Array] = None,
    limit: Optional[int] = None,
    batch_size: int = 8,
    segment_len: int = 20,
    buckets: Optional[Sequence[int]] = None,
    collect_images: bool = False,
    restarts: int = 1,
    restart_select: str = "ge",
    return_diagnostics: bool = False,
    fallback_loss: Optional[float] = None,
    fallback_disp_px: Optional[float] = None,
    fallback_scorer: Optional[Callable] = None,
    fallback_scorer_margin: float = 0.0,
):
    """Batched variant of run_immoco: slices are fitted in vmapped batches
    (the production throughput mode; parallel/sharded_fit machinery).

    ``buckets``: optional ascending movement-count bucket sizes (all <=
    cfg.max_movements).  Each slice is routed to the smallest bucket that
    holds its detected group count, and one compiled model per bucket
    processes its slices — the warp/FFT cost of a fit is linear in the
    movement padding, so e.g. a 7-group light slice in a 10-bucket costs
    ~40% of the same slice padded to 24 (the reference only ever processes
    actual groups, src/models/immoco.py:67-80; static-shape XLA pays for
    padding instead, and bucketing claws that back).  Zero-padded group
    masks make truncation to any bucket >= the group count exact
    (tests/test_immoco_fit.py padding invariance).

    ``restarts``: best-of-K restart selection (deliberate divergence; the
    reference fits once).  Each slice is fitted ``restarts`` times from
    different init keys and one result is kept by the self-supervised
    ``restart_select`` criterion (no GT involved):
      - "ge":   lowest gradient entropy of the reconstructed image (the
        fit's own prior; scripts/probe_init_variance.py: min-GE tracks the
        better seeds on failing heavy slices), or
      - "loss": lowest final-iteration fit loss — the lambda schedule has
        decayed to ~0 by the last iteration, so this is effectively the
        k-space data-consistency residual.  Measured on the worst heavy
        slices (scripts/probe_failing_heavy.py, seed table in
        PERFORMANCE.md): picks the best-PSNR seed on 2/3 slices where
        min-GE prefers over-smoothed fits.
    Cost scales linearly with K.  restarts=1 is bit-identical to before.

    ``return_diagnostics``: additionally return a per-slice dict list with
    the SELECTED fit's final-iteration loss (the ~data-consistency residual
    — the lambda schedule is ~0 by the last iteration), the detected group
    count, the routed bucket size, and the corrupted-column count — the
    self-supervised signals a do-no-harm fallback can threshold on.

    ``fallback_loss``: per-slice do-no-harm fallback (deliberate divergence;
    the reference always returns the fit, immoco.py:206).  A fit whose
    final data-consistency residual exceeds this threshold has, by its own
    account, failed to model the measured data; such slices report the
    corrupted (zero-motion) reconstruction instead.  Self-supervised — no
    ground truth involved; diagnostics mark them with "fallback": True.

    ``fallback_disp_px``: displacement-anomaly fallback (deliberate
    divergence, same do-no-harm contract as ``fallback_loss``).  Degenerate
    motion fits converge to a basin with a large, near-uniform fitted
    displacement on EVERY group (~7 px mean vs ~2 px for healthy fits —
    PERFORMANCE.md failing-heavy attribution, scripts/probe_motion_disp.py);
    slices whose post-fit mean |displacement| exceeds this threshold report
    the corrupted reconstruction instead.  Self-supervised: the signal is
    the fit's own motion field, no ground truth involved.

    ``fallback_scorer``: learned no-reference do-no-harm selector (same
    contract): a callable (H, W) magnitude image -> scalar artifact score
    (lower = cleaner; e.g. the AF+ metric net's objective
    mean(x*1e4*sigmoid(net(x*1e4))), models/af_plus.py:13 — the direction
    PERFORMANCE.md's fallback section names, since the residual-based
    trigger is only weakly correlated with harm).  A slice reports the
    corrupted reconstruction when score(corrected) > score(corrupted) +
    ``fallback_scorer_margin``.  Diagnostics record both scores.
    """
    import dataclasses as _dc
    import time as _time

    from miccai24_immoco_tpu.parallel.sharded_fit import (
        make_batched_segmented_fit,
    )

    # Wall-clock attribution (VERDICT r4 next #6): phase timers stashed in
    # LAST_TIMING after every call — detection, per-bucket first batch
    # (compile+run) vs steady batches, slice counts.  Read by
    # scripts/e2e_eval.py into meta.json.
    timing: Dict[str, Any] = {"buckets": {}}
    _t0 = _time.time()

    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    # Optional noise-free GT (synthetic corpora): adds *_clean supplementary
    # metric columns — rigid k-space corruption is unitary, so corrupted
    # images keep the noisy GT's exact noise realization and denoising
    # reconstructions are PSNR-penalized against it (PERFORMANCE.md,
    # heavy-PSNR diagnosis); the clean-GT columns remove that floor.
    gt_clean_all = corpus.get("image_clean")
    masks_all = corpus.get("mask")
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    h, w = ks_all.shape[-2:]
    if key is None:
        key = jax.random.PRNGKey(0)
    # Detect masks + group counts for every slice up front, in chunked
    # BATCHED graphs (VERDICT r3 weak #5: the per-slice detector forward
    # paid one tunnel round trip per slice — ~50 launches; batching folds
    # detection+grouping of 8 slices into 2 launches per chunk).  Chunks
    # are padded to a fixed size so exactly one graph compiles.
    det_b = min(8, max(n, 1))

    @jax.jit
    def _groups_b(inds):
        return jax.vmap(
            lambda ind: extract_movement_groups(ind, h, cfg.max_movements)
        )(inds)

    if kld is not None:
        _net = kld["net"]

        @jax.jit
        def _detect_b(params, ksp_b):
            masks_b = predict_line_mask(_net, params, ksp_b)
            return jax.vmap(mask_to_line_indicators)(masks_b)

    elif masks_all is None:
        raise ValueError("need either a klD-Net or ground-truth masks")

    slice_masks = []
    slice_counts = []
    for start in range(0, n, det_b):
        idxs_c = list(range(start, min(start + det_b, n)))
        idx_p = idxs_c + [idxs_c[-1]] * (det_b - len(idxs_c))
        if kld is not None:
            inds = _detect_b(kld["params"], put_complex(ks_all[idx_p]))
        else:
            inds = jnp.asarray(
                np.stack([np.asarray(masks_all[i][0]) > 0 for i in idx_p])
            )
        m_b, ng_b = _groups_b(inds)
        ng_host = np.asarray(ng_b)
        for j, _i in enumerate(idxs_c):
            slice_masks.append(m_b[j])
            slice_counts.append(int(ng_host[j]))
    timing["detect_s"] = round(_time.time() - _t0, 2)

    if buckets:
        sizes = sorted({min(int(b), cfg.max_movements) for b in buckets})
        if sizes[-1] < cfg.max_movements:
            sizes.append(cfg.max_movements)
    else:
        sizes = [cfg.max_movements]

    def bucket_of(count):
        for s in sizes:
            if count <= s:
                return s
        return sizes[-1]

    by_bucket: Dict[int, List[int]] = {}
    for i, c in enumerate(slice_counts):
        by_bucket.setdefault(bucket_of(c), []).append(i)

    restarts = max(int(restarts), 1)
    if restart_select not in ("ge", "loss"):
        raise ValueError(f"unknown restart_select {restart_select!r}")
    vge = jax.jit(jax.vmap(gradient_entropy)) if restarts > 1 else None
    # Per-batch vmapped metrics: one launch per (batch, gt variant) instead
    # of one per slice (VERDICT r3 weak #5 — the host-side metric loop).
    _metrics_b = jax.jit(
        jax.vmap(lambda p, g: _slice_metrics(jnp.abs(p), jnp.abs(g)))
    )
    metrics_by_idx: Dict[int, Dict[str, float]] = {}
    diag_by_idx: Dict[int, Dict[str, float]] = {}
    ge_by_idx: Dict[int, float] = {}
    img_by_idx: Dict[int, np.ndarray] = {}
    last_images = None
    for size in sizes:
        idxs = by_bucket.get(size)
        if not idxs:
            continue
        bcfg = _dc.replace(cfg, max_movements=size)
        _tb = _time.time()
        model = build_immoco(bcfg, h, w)
        run = make_batched_segmented_fit(model, segment_len=segment_len)
        bt = timing["buckets"].setdefault(
            size, {"build_s": 0.0, "batch_s": [], "n_slices": len(idxs)}
        )
        bt["build_s"] = round(_time.time() - _tb, 2)
        # One job per (slice, restart seed); K=1 degenerates to one per slice.
        jobs = [(i, s) for i in idxs for s in range(restarts)]
        for start in range(0, len(jobs), batch_size):
            _tb = _time.time()
            batch = jobs[start : start + batch_size]
            pad = batch_size - len(batch)
            batch_padded = batch + [batch[-1]] * pad  # padded fits dropped
            idx_padded = [i for i, _ in batch_padded]
            ksp = put_complex(ks_all[idx_padded])
            masks = jnp.stack([slice_masks[i][:size] for i in idx_padded])
            # Per-slice deterministic init keys: fold_in by corpus index (and
            # restart seed) so a slice's fit is invariant to batch
            # composition / bucket routing (a batch-order split made results
            # depend on which slices shared a batch — observed ~3 dB PSNR
            # spread on heavy slice 16).  restarts*i + s == i when K=1.
            keys = jnp.stack(
                [
                    jax.random.fold_in(key, restarts * i + s)
                    for i, s in batch_padded
                ]
            )
            want_diag = (
                return_diagnostics
                or fallback_loss is not None
                or fallback_disp_px is not None
                or fallback_scorer is not None
            )
            if want_diag:
                result, fit_diag = run(
                    ksp, masks, keys, model.statics, with_diag=True
                )
                mean_disp = np.asarray(fit_diag["mean_disp_px"])
            else:
                result = run(ksp, masks, keys, model.statics)
                mean_disp = None
            final_losses = (
                np.asarray(result.losses[:, -1]) if want_diag else None
            )
            if restarts == 1:
                ges = np.zeros(batch_size)
            elif restart_select == "loss":
                ges = (final_losses if final_losses is not None
                       else np.asarray(result.losses[:, -1]))
            else:
                ges = np.asarray(vge(result.image))
            vals_b = np.asarray(
                _metrics_b(result.image, put_complex(gt_all[idx_padded]))
            )
            vals_clean_b = (
                np.asarray(
                    _metrics_b(
                        result.image, put_complex(gt_clean_all[idx_padded])
                    )
                )
                if gt_clean_all is not None
                else None
            )
            for j, (i, _s) in enumerate(batch):
                if not _restart_improves(ge_by_idx.get(i), ges[j]):
                    continue  # an earlier restart of this slice won
                ge_by_idx[i] = float(ges[j])
                if final_losses is not None:
                    diag_by_idx[i] = {
                        "final_loss": float(final_losses[j]),
                        "mean_disp_px": float(mean_disp[j]),
                        "n_groups": slice_counts[i],
                        "bucket": size,
                        "corrupted_cols": float(
                            np.asarray(slice_masks[i].sum())
                        ) / h,
                    }
                metrics_by_idx[i] = {
                    k: float(v) for k, v in zip(METRIC_NAMES, vals_b[j])
                }
                if fallback_scorer is not None:
                    img_by_idx[i] = np.asarray(jnp.abs(result.image[j]))
                if vals_clean_b is not None:
                    metrics_by_idx[i].update(
                        {
                            f"{k}_clean": float(v)
                            for k, v in zip(METRIC_NAMES, vals_clean_b[j])
                        }
                    )
                if collect_images and i == n - 1:
                    ksp_i = put_complex(ks_all[i])
                    last_images = {
                        "Motion corrupted image": np.abs(
                            np.asarray(ifft2c(ksp_i).real)
                        )
                        + 1j * 0,
                        "Motion corrected image": np.asarray(
                            jnp.abs(result.image[j])
                        ),
                        "Ground truth image": np.asarray(
                            jnp.abs(put_complex(gt_all[i]))
                        ),
                    }
            bt["batch_s"].append(round(_time.time() - _tb, 2))
    timing["total_s"] = round(_time.time() - _t0, 2)
    global LAST_TIMING
    LAST_TIMING = timing
    if (fallback_loss is not None or fallback_disp_px is not None
            or fallback_scorer is not None):
        for i in range(n):
            trigger = (
                fallback_loss is not None
                and diag_by_idx[i]["final_loss"] > fallback_loss
            ) or (
                fallback_disp_px is not None
                and diag_by_idx[i]["mean_disp_px"] > fallback_disp_px
            )
            if fallback_scorer is not None:
                s_corr = float(fallback_scorer(jnp.asarray(img_by_idx[i])))
                s_base = float(fallback_scorer(
                    jnp.abs(ifft2c(put_complex(ks_all[i])))
                ))
                diag_by_idx[i]["score_corrected"] = s_corr
                diag_by_idx[i]["score_corrupted"] = s_base
                trigger = trigger or (
                    s_corr > s_base + fallback_scorer_margin
                )
            diag_by_idx[i]["fallback"] = bool(trigger)
            if not trigger:
                continue
            corrupted_img = ifft2c(put_complex(ks_all[i]))
            metrics_by_idx[i] = _metrics_dict(
                corrupted_img, put_complex(gt_all[i])
            )
            if gt_clean_all is not None:
                clean = _metrics_dict(
                    corrupted_img, put_complex(gt_clean_all[i])
                )
                metrics_by_idx[i].update(
                    {f"{k}_clean": v for k, v in clean.items()}
                )
            if collect_images and last_images is not None and i == n - 1:
                last_images["Motion corrected image"] = np.asarray(
                    jnp.abs(corrupted_img)
                )
    metrics = [metrics_by_idx[i] for i in range(n)]
    if return_diagnostics:
        diags = [diag_by_idx[i] for i in range(n)]
        if collect_images:
            return metrics, last_images, diags
        return metrics, diags
    if collect_images:
        return metrics, last_images
    return metrics


def run_autofocusing(
    corpus: dict,
    cfg: AutofocusingConfig = AutofocusingConfig(),
    kld: Optional[dict] = None,
    limit: Optional[int] = None,
):
    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    masks_all = corpus.get("mask")
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    h, w = ks_all.shape[-2:]
    fit = jax.jit(make_autofocus_fit(cfg))
    indicator_fn = _make_indicator_fn(kld)
    groups = jax.jit(
        lambda ind: extract_movement_groups(ind, h, cfg.max_movements)
    )

    gt_clean_all = corpus.get("image_clean")
    metrics = []
    for i in range(n):
        ksp = put_complex(ks_all[i])
        gt = put_complex(gt_all[i])
        ind = _line_indicators(
            ksp, None if masks_all is None else masks_all[i], kld,
            indicator_fn,
        )
        masks, _ = groups(ind)
        result = fit(ksp, masks)
        m = _metrics_dict(result.image, gt)
        if gt_clean_all is not None:
            m.update({f"{k}_clean": v for k, v in _metrics_dict(
                result.image, put_complex(gt_clean_all[i])).items()})
        metrics.append(m)
    return metrics


def run_afplus(
    corpus: dict,
    metric_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    cfg: AFPlusConfig = AFPlusConfig(),
    limit: Optional[int] = None,
    *,
    metric_apply=None,
    params=None,
    kld: Optional[dict] = None,
):
    """AF+ eval loop (test_afplus_original.py protocol).

    Pass EITHER metric_fn (closure over params — tests/small nets only:
    closed-over params become trace-time HLO constants) OR
    metric_apply=(params, img)->logits with params — the statics-discipline
    path required for real checkpoints on the remote-compile runtime; it
    also lets several param sets share one compiled fit.

    ``kld``: DC-project the AF+ output like the denoiser's denoise_dc.
    MEASURED NEGATIVE (round 4, 8-slice hard probe): 0.2995 ssim vs 0.8017
    plain — AF+'s per-column phase ramps + NUFFT rotation globally
    transform the image, so fft2c(result.image) no longer aligns with the
    measured clean columns and the mixture ghosts.  DC helps only
    geometry-preserving methods (the image-space denoiser).  Kept opt-in
    for completeness."""
    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    if metric_apply is not None:
        fit_p = jax.jit(make_afplus_fit_p(metric_apply, cfg))
        call = lambda k: fit_p(k, params)
    else:
        call = jax.jit(make_afplus_fit(metric_fn, cfg))

    if kld is not None:
        from miccai24_immoco_tpu.ops.fft import fft2c
        from miccai24_immoco_tpu.train.train_kld import (
            mask_to_line_indicators,
            predict_line_mask,
        )

        # Statics discipline: detector params as a traced argument (see
        # run_denoiser._dc_forward).
        @jax.jit
        def _dc_project(img_c, ksp, kld_params):
            pred = predict_line_mask(kld["net"], kld_params, ksp[None])[0]
            ind = mask_to_line_indicators(pred)
            k_out = jnp.where(ind[None, :], fft2c(img_c), ksp)
            return ifft2c(k_out)

    gt_clean_all = corpus.get("image_clean")
    metrics = []
    for i in range(n):
        ksp_i = put_complex(ks_all[i])
        result = call(ksp_i)
        if kld is not None:
            result = result._replace(
                image=_dc_project(result.image, ksp_i, kld["params"]))
        m = _metrics_dict(result.image, put_complex(gt_all[i]))
        if gt_clean_all is not None:
            m.update({f"{k}_clean": v for k, v in _metrics_dict(
                result.image, put_complex(gt_clean_all[i])).items()})
        metrics.append(m)
    return metrics


def run_denoiser(
    corpus: dict, net, params, limit: Optional[int] = None,
    kld: Optional[dict] = None,
):
    """``kld={"net", "params"}`` switches to the DC-projected variant
    (train_denoiser.denoise_dc): detector-predicted clean columns are kept
    verbatim, the denoiser fills only corrupted columns."""
    import jax

    from miccai24_immoco_tpu.train.train_denoiser import denoise, denoise_dc
    from miccai24_immoco_tpu.train.train_kld import (
        mask_to_line_indicators,
        predict_line_mask,
    )

    ks_all = corpus["kspace_motion"]
    gt_all = corpus["image_rss"]
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    gt_clean_all = corpus.get("image_clean")

    if kld is not None:
        # Statics discipline (CLAUDE.md landmine 5): BOTH param trees are
        # traced arguments — closure capture bakes the U-Net weights into
        # the HLO as constants (measured: 141 MB cache entry per
        # checkpoint + minutes of constant folding).
        @jax.jit
        def _dc_forward(ksp, dn_params, kld_params):
            pred = predict_line_mask(kld["net"], kld_params, ksp)
            ind = jax.vmap(mask_to_line_indicators)(pred)
            return denoise_dc(net, dn_params, ksp, ind)

    metrics = []
    for i in range(n):
        if kld is not None:
            out = _dc_forward(
                put_complex(ks_all[i])[None], params, kld["params"])[0]
        else:
            out = denoise(net, params, put_complex(ks_all[i])[None])[0]
        m = _metrics_dict(out, put_complex(gt_all[i]))
        if gt_clean_all is not None:
            m.update({f"{k}_clean": v for k, v in _metrics_dict(
                out, put_complex(gt_clean_all[i])).items()})
        metrics.append(m)
    return metrics


def run_kld(corpus: dict, net, params, limit: Optional[int] = None):
    """Mask-quality metrics (dice/IoU/sens/spec/prec/F1) per slice, the
    test_klinedetect.py protocol."""
    from miccai24_immoco_tpu.ops.metrics import (
        classification_metrics,
        dice_coef,
        iou_coef,
    )

    ks_all = corpus["kspace_motion"]
    masks_all = corpus["mask"]
    n = ks_all.shape[0] if limit is None else min(limit, ks_all.shape[0])
    out = []
    for i in range(n):
        pred = predict_line_mask(net, params, put_complex(ks_all[i])[None])[0]
        gt = jnp.asarray(masks_all[i]).astype(jnp.float32)
        predf = pred.astype(jnp.float32)
        stats = {
            "dice": float(dice_coef(predf, gt)),
            "iou": float(iou_coef(predf, gt)),
        }
        stats.update(
            {k: float(v) for k, v in classification_metrics(predf, gt).items()}
        )
        out.append(stats)
    return out
