"""Method-runner tests over a small synthetic corpus with oracle masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import (
    AutofocusingConfig,
    InstanceFitConfig,
    KLDTrainConfig,
    UnetConfig,
)
from miccai24_immoco_tpu.data.synthetic import phantom_stack
from miccai24_immoco_tpu.eval.runners import (
    run_autofocusing,
    run_denoiser,
    run_immoco,
    run_kld,
)
from miccai24_immoco_tpu.models.unet import build_unet
from miccai24_immoco_tpu.ops.fft import fft2c
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
from miccai24_immoco_tpu.utils.hostio import get_complex

import sys

sys.path.insert(0, "tests")
from test_immoco_fit import small_cfg  # noqa: E402


@pytest.fixture(scope="module")
def corpus():
    images = phantom_stack(2, 32, 32, seed=9)
    sims = simulate_motion_batch(
        jax.random.PRNGKey(1), images, n_movements=2, max_movements=4
    )
    return {
        "kspace_motion": get_complex(sims.kspace),
        "image_rss": get_complex(images),
        "mask": np.asarray(sims.mask),
    }


def test_run_immoco_oracle_masks(corpus):
    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    metrics, images = run_immoco(corpus, cfg, limit=2, collect_images=True)
    assert len(metrics) == 2
    assert all(np.isfinite(m["psnr"]) for m in metrics)
    assert set(images) == {
        "Motion corrupted image",
        "Motion corrected image",
        "Ground truth image",
    }


def test_run_autofocusing(corpus):
    metrics = run_autofocusing(
        corpus, AutofocusingConfig(iters=3, max_movements=4), limit=1
    )
    assert len(metrics) == 1 and np.isfinite(metrics[0]["ssim"])


def test_run_denoiser_and_kld(corpus):
    unet_cfg = UnetConfig(in_chans=1, out_chans=1, chans=4, num_pool_layers=2)
    net = build_unet(unet_cfg)
    params = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 1))
    )["params"]
    metrics = run_denoiser(corpus, net, params, limit=1)
    assert np.isfinite(metrics[0]["rmse"])

    kld_cfg = UnetConfig(in_chans=2, out_chans=1, chans=4, num_pool_layers=2)
    kld_net = build_unet(kld_cfg)
    kld_params = kld_net.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 32, 32, 2))
    )["params"]
    stats = run_kld(corpus, kld_net, kld_params, limit=1)
    assert {"dice", "iou", "sensitivity", "specificity", "precision", "f1"} <= set(
        stats[0]
    )

    # DC-projected variant: detector-clean columns kept verbatim.
    dc = run_denoiser(
        corpus, net, params, limit=1,
        kld={"net": kld_net, "params": kld_params},
    )
    assert np.isfinite(dc[0]["rmse"])


def test_run_immoco_batched_matches_serial(corpus):
    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched

    serial, _ = run_immoco(corpus, cfg, limit=2)
    batched = run_immoco_batched(corpus, cfg, limit=2, batch_size=2,
                                 segment_len=3)
    assert len(batched) == 2
    # Different PRNG key trees (batch split vs serial split) mean different
    # INR inits; at 5 toy iterations results differ by a few dB — assert
    # structural sanity, not equality.
    for a, b in zip(serial, batched):
        assert np.isfinite(b["psnr"]) and np.isfinite(b["ssim"])
        assert abs(a["psnr"] - b["psnr"]) < 6.0


def test_run_immoco_batched_batch_invariance(corpus):
    """A slice's fit must not depend on which slices share its batch: init
    keys are fold_in(key, corpus_index), so regrouping the corpus into
    different batch sizes yields bit-identical per-slice metrics."""
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    a = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3)
    b = run_immoco_batched(corpus, cfg, batch_size=1, segment_len=3)
    # batch 1 vs batch 2 are different compiled programs (different XLA
    # fusions) -> tiny float drift; the keys (and hence the fits) are the
    # same, so agreement is at float-noise level, not the multi-dB spread a
    # batch-order key split produced.
    for ma, mb in zip(a, b):
        np.testing.assert_allclose(ma["psnr"], mb["psnr"], rtol=1e-3)
        np.testing.assert_allclose(ma["ssim"], mb["ssim"], rtol=1e-3)


def test_run_immoco_batched_restarts(corpus):
    """Best-of-K GE restart selection: deterministic, invariant to how jobs
    are grouped into batches (jobs of one slice may straddle batches), and
    never returns non-finite metrics."""
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    a = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3,
                           restarts=2)
    a2 = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3,
                            restarts=2)
    b = run_immoco_batched(corpus, cfg, batch_size=1, segment_len=3,
                           restarts=2)
    c = run_immoco_batched(corpus, cfg, batch_size=3, segment_len=3,
                           restarts=2)
    for ma, ma2, mb, mc in zip(a, a2, b, c):
        assert np.isfinite(ma["psnr"])
        assert ma == ma2  # deterministic
        # Different batch shapes are different compiled programs -> float
        # noise only; the (slice, seed) key tree is the same.
        np.testing.assert_allclose(ma["psnr"], mb["psnr"], rtol=1e-3)
        np.testing.assert_allclose(ma["psnr"], mc["psnr"], rtol=1e-3)
    # Final-loss criterion: also deterministic + finite, and each slice's
    # result is one of the same per-seed fits (same keys) the GE run saw.
    d = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3,
                           restarts=2, restart_select="loss")
    d2 = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3,
                            restarts=2, restart_select="loss")
    for md, md2 in zip(d, d2):
        assert np.isfinite(md["psnr"])
        assert md == md2
    import pytest

    with pytest.raises(ValueError):
        run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3,
                           restarts=2, restart_select="nope")


def test_run_immoco_batched_bucketing_exact(corpus):
    """Movement bucketing must be numerically invisible: a slice fitted in a
    bucket >= its group count gives the same result as max_movements padding
    (zero-padded masks; same per-batch key tree when the split is equal)."""
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    base = run_immoco_batched(corpus, cfg, limit=2, batch_size=2,
                              segment_len=3)
    # Both slices have 2 groups -> both land in the 3-bucket; key split
    # (one batch either way) is identical, so results must match closely.
    bucketed = run_immoco_batched(corpus, cfg, limit=2, batch_size=2,
                                  segment_len=3, buckets=(3,))
    for a, b in zip(base, bucketed):
        np.testing.assert_allclose(a["psnr"], b["psnr"], rtol=1e-3)
        np.testing.assert_allclose(a["ssim"], b["ssim"], rtol=1e-3)

    # collect_images returns the figure triple.
    metrics, images = run_immoco_batched(
        corpus, cfg, limit=2, batch_size=2, segment_len=3, buckets=(3,),
        collect_images=True,
    )
    assert images is not None and "Motion corrected image" in images


def test_run_immoco_batched_diagnostics(corpus):
    """return_diagnostics exposes the selected fit's final data-consistency
    residual plus grouping facts — the self-supervised signals for do-no-
    harm fallback (scripts/probe_fallback.py)."""
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    metrics, diags = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, return_diagnostics=True
    )
    assert len(diags) == len(metrics) == 2
    for d in diags:
        assert np.isfinite(d["final_loss"]) and d["final_loss"] >= 0
        assert np.isfinite(d["mean_disp_px"]) and d["mean_disp_px"] >= 0
        assert d["n_groups"] == 2
        assert d["bucket"] == 4
        assert 0 < d["corrupted_cols"] < 32
    # Plain call shape unchanged.
    plain = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3)
    assert isinstance(plain, list) and len(plain) == 2
    # With restarts, the diagnostic follows the SELECTED restart.
    m2, d2 = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, restarts=2,
        restart_select="loss", return_diagnostics=True,
    )
    m2b, d2b = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, restarts=2,
        restart_select="loss", return_diagnostics=True,
    )
    assert d2 == d2b and m2 == m2b


def test_run_immoco_batched_fallback(corpus):
    """fallback_loss: a threshold of 0 forces every slice to fall back to
    the corrupted reconstruction (its metrics equal the direct corrupted
    scoring); an inf threshold is a no-op vs the plain run."""
    from miccai24_immoco_tpu.eval.runners import run_immoco_batched
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.utils.hostio import put_complex

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    plain = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3)
    noop, d_noop = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, fallback_loss=float("inf"),
        return_diagnostics=True,
    )
    assert plain == noop
    assert all(d["fallback"] is False for d in d_noop)

    forced, d_forced = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, fallback_loss=0.0,
        return_diagnostics=True,
    )
    assert all(d["fallback"] is True for d in d_forced)
    from miccai24_immoco_tpu.eval.runners import _metrics_dict

    for i, m in enumerate(forced):
        expect = _metrics_dict(
            ifft2c(put_complex(corpus["kspace_motion"][i])),
            put_complex(corpus["image_rss"][i]),
        )
        assert m["psnr"] == expect["psnr"] and m["ssim"] == expect["ssim"]


def test_run_immoco_batched_fallback_disp(corpus):
    """fallback_disp_px: threshold 0 forces the corrupted reconstruction on
    every slice (every fit has nonzero mean displacement); a huge threshold
    is a no-op.  The displacement-anomaly fallback targets the degenerate
    motion basin of the failing heavy slices (PERFORMANCE.md)."""
    from miccai24_immoco_tpu.eval.runners import _metrics_dict, run_immoco_batched
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.utils.hostio import put_complex

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    plain = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3)
    noop, d_noop = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3,
        fallback_disp_px=float("inf"), return_diagnostics=True,
    )
    assert plain == noop
    assert all(d["fallback"] is False for d in d_noop)

    forced, d_forced = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3, fallback_disp_px=0.0,
        return_diagnostics=True,
    )
    assert all(d["fallback"] is True for d in d_forced)
    assert all(d["mean_disp_px"] > 0 for d in d_forced)
    for i, m in enumerate(forced):
        expect = _metrics_dict(
            ifft2c(put_complex(corpus["kspace_motion"][i])),
            put_complex(corpus["image_rss"][i]),
        )
        assert m["psnr"] == expect["psnr"] and m["ssim"] == expect["ssim"]


def test_run_immoco_batched_fallback_scorer(corpus):
    """fallback_scorer (learned no-reference selector): a scorer that
    always prefers the corrupted image flips every slice; one that always
    prefers the correction is a no-op; both scores land in diagnostics."""
    import jax.numpy as jnp

    from miccai24_immoco_tpu.eval.runners import _metrics_dict, run_immoco_batched
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.utils.hostio import put_complex

    cfg = small_cfg("lattice", "lattice", iters=5, max_movements=4)
    plain = run_immoco_batched(corpus, cfg, batch_size=2, segment_len=3)

    # Scorer = negative image mean: corrected and corrupted differ, so use
    # a deterministic rule keyed on which input we see.  The corrupted
    # magnitudes are reproducible; mark them with score 0, others 1.
    corrupted_means = {
        round(float(jnp.abs(ifft2c(put_complex(k))).mean()), 6)
        for k in corpus["kspace_motion"]
    }

    def prefers_corrupted(img):
        return 0.0 if round(float(img.mean()), 6) in corrupted_means else 1.0

    def prefers_corrected(img):
        return 1.0 if round(float(img.mean()), 6) in corrupted_means else 0.0

    noop, d_noop = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3,
        fallback_scorer=prefers_corrected, return_diagnostics=True,
    )
    assert plain == noop
    assert all(d["fallback"] is False for d in d_noop)
    assert all(
        d["score_corrected"] == 0.0 and d["score_corrupted"] == 1.0
        for d in d_noop
    )

    forced, d_forced = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3,
        fallback_scorer=prefers_corrupted, return_diagnostics=True,
    )
    assert all(d["fallback"] is True for d in d_forced)
    for i, m in enumerate(forced):
        expect = _metrics_dict(
            ifft2c(put_complex(corpus["kspace_motion"][i])),
            put_complex(corpus["image_rss"][i]),
        )
        assert m["psnr"] == expect["psnr"] and m["ssim"] == expect["ssim"]
    # A large margin suppresses the flip (do-no-harm stays conservative).
    lenient, d_len = run_immoco_batched(
        corpus, cfg, batch_size=2, segment_len=3,
        fallback_scorer=prefers_corrupted, fallback_scorer_margin=10.0,
        return_diagnostics=True,
    )
    assert plain == lenient
    assert all(d["fallback"] is False for d in d_len)


def test_restart_improves_nan_safe():
    """Best-of-K winner rule: a diverged (NaN) restart never displaces a
    finite earlier winner, and finite scores pick the minimum."""
    from miccai24_immoco_tpu.eval.runners import _restart_improves

    nan = float("nan")
    assert _restart_improves(None, 0.4)          # first restart always wins
    assert _restart_improves(None, nan)          # ...even a bad one
    assert not _restart_improves(0.4, nan)       # NaN never beats finite
    assert _restart_improves(nan, 0.4)           # finite replaces NaN
    assert not _restart_improves(nan, nan)       # NaN vs NaN: keep first
    assert _restart_improves(0.5, 0.4)           # lower score wins
    assert not _restart_improves(0.4, 0.5)
    assert not _restart_improves(0.4, 0.4)       # ties keep the earlier


def test_hard_scenario_corpus_is_harder():
    """The round-4 'hard' scenario (cli._synthetic_corpus) must corrupt
    more than 'heavy' at the same size/seed — it exists to reproduce the
    reference's corrupted-SSIM ~0.7-0.85 regime (VERDICT r3 missing #2)."""
    import jax.numpy as jnp

    from miccai24_immoco_tpu.cli import _synthetic_corpus
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.ops.metrics import center_crop_quarter, ssim
    from miccai24_immoco_tpu.utils.hostio import put_complex

    def corrupted_ssim(scenario):
        c = _synthetic_corpus(2, 64, scenario, seed=3)
        k = put_complex(c["kspace_motion"])
        gt = put_complex(c["image_rss"])
        rec = jax.vmap(ifft2c)(k)
        return float(
            ssim(
                center_crop_quarter(jnp.abs(rec)[:, None]),
                center_crop_quarter(jnp.abs(gt)[:, None]),
            )
        )

    assert corrupted_ssim("hard") < corrupted_ssim("heavy")
