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
