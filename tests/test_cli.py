"""CLI smoke tests with synthetic corpora (tiny sizes)."""

import json
import os

import numpy as np
import pytest

from miccai24_immoco_tpu.cli import build_parser, main


def test_parser_covers_reference_workflows():
    p = build_parser()
    cmds = {a.dest for a in p._subparsers._group_actions[0].choices.values()} \
        if False else set(p._subparsers._group_actions[0].choices.keys())
    assert {
        "prepare-data",
        "train-kld",
        "train-denoiser",
        "eval-immoco",
        "eval-autofocus",
        "eval-denoiser",
        "eval-kld",
        "bench",
    } <= cmds


def test_cli_train_and_eval_roundtrip(tmp_path, capsys):
    ckpt = str(tmp_path / "kld_ckpt")
    main(
        [
            "train-kld",
            "--synthetic", "4",
            "--size", "32",
            "--steps", "3",
            "--out", ckpt,
        ]
    )
    assert os.path.isdir(ckpt)
    out = capsys.readouterr().out
    assert "saved" in out

    main(
        [
            "eval-kld",
            "--synthetic", "2",
            "--size", "32",
            "--scenarios", "light",
            "--ckpt", ckpt,
        ]
    )
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    assert "light" in stats and "dice" in stats["light"]


def test_cli_eval_immoco_synthetic(tmp_path, capsys):
    main(
        [
            "eval-immoco",
            "--synthetic", "2",
            "--size", "32",
            "--scenarios", "light",
            "--iters", "3",
            "--limit", "2",
            "--out-dir", str(tmp_path / "results"),
        ]
    )
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    assert "light" in stats and "ssim" in stats["light"]
    assert os.path.exists(tmp_path / "results" / "immoco.json")
    assert os.path.exists(tmp_path / "results" / "immoco.tex")


def test_cli_train_afplus_resume_continues_schedule(tmp_path, capsys):
    """--resume restores opt_state + step: the run continues rather than
    warm-starting a fresh schedule (ADVICE round 1)."""
    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

    ckpt = str(tmp_path / "afplus_ckpt")
    base = ["train-afplus", "--synthetic", "2", "--size", "24",
            "--inner-iters", "2", "--chans", "4", "--pools", "2",
            "--out", ckpt]
    main(base + ["--steps", "2"])
    tree, meta = restore_with_meta(ckpt)
    assert meta["step"] == 2
    assert "params" in tree and "opt_state" in tree
    # Adam's step count lives in opt_state; after a full save it is 2.
    counts = [x for x in __import__("jax").tree.leaves(tree["opt_state"])
              if np.asarray(x).size == 1]
    assert any(int(np.asarray(c).reshape(())) == 2 for c in counts)

    main(base + ["--steps", "4", "--resume", ckpt])
    tree2, meta2 = restore_with_meta(ckpt)
    assert meta2["step"] == 4
    counts2 = [x for x in __import__("jax").tree.leaves(tree2["opt_state"])
               if np.asarray(x).size == 1]
    assert any(int(np.asarray(c).reshape(())) == 4 for c in counts2)
    capsys.readouterr()


def test_cli_eval_downstream_synthetic(capsys):
    main(
        [
            "eval-downstream",
            "--synthetic", "1",
            "--size", "32",
            "--scenarios", "light",
            "--iters", "2",
            "--limit", "1",
            "--patch-size", "12",
        ]
    )
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    assert "ssim" in stats and "rmse" in stats


def test_cli_train_denoiser_lesion_corpus(tmp_path, capsys):
    """--lesions: the classification-task denoiser variant — the same
    recipe trained on lesion-corpus slices (reference
    train_unet_denoiser_classification.py:62-72, the fifth distributed
    checkpoint unet_denoising_classification_task)."""
    ckpt = str(tmp_path / "dn_cls")
    main(
        [
            "train-denoiser",
            "--lesions", "6",
            "--size", "48",
            "--steps", "2",
            "--chans", "4",
            "--pools", "2",
            "--out", ckpt,
        ]
    )
    assert os.path.isdir(ckpt)
    assert "saved" in capsys.readouterr().out


def test_cli_eval_afplus_params_only_ckpt(tmp_path, capsys):
    """eval-afplus accepts both the trainer's {"params","opt_state"}
    checkpoints and bare {"params": ...} saves (regression: the latter
    double-wrapped and crashed flax apply)."""
    import jax
    import jax.numpy as jnp

    from miccai24_immoco_tpu.config import UnetConfig
    from miccai24_immoco_tpu.models.unet import build_unet
    from miccai24_immoco_tpu.utils.checkpoint import save

    net = build_unet(UnetConfig(in_chans=1, out_chans=1, chans=4,
                                num_pool_layers=2, norm="instance"))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                      train=False)["params"]
    ckpt = str(tmp_path / "afplus_params_only")
    save(ckpt, {"params": params}, metadata={"step": 0})

    main([
        "eval-afplus", "--ckpt", ckpt,
        "--synthetic", "1", "--size", "32", "--scenarios", "light",
        "--iters", "2", "--chans", "4", "--pools", "2",
        "--out-dir", str(tmp_path / "results"),
    ])
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    assert "light" in stats and "ssim" in stats["light"]
