"""Tracker / timers / checkpoint / harness / figures tests."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from miccai24_immoco_tpu.eval.figures import method_comparison_figure
from miccai24_immoco_tpu.eval.harness import (
    aggregate,
    evaluate_slices,
    latex_table,
    save_report,
)
from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta, save
from miccai24_immoco_tpu.utils.timing import PhaseTimer
from miccai24_immoco_tpu.utils.tracking import Tracker


def test_tracker_jsonl(tmp_path):
    t = Tracker("proj", "run1", config={"lr": 1e-2},
                out_dir=str(tmp_path), use_wandb=False)
    t.log({"loss": 1.5})
    t.log({"loss": jnp.asarray(0.5)}, step=10)
    t.finish()
    lines = [json.loads(l) for l in open(t.path)]
    assert lines[0]["_event"] == "config" and lines[0]["lr"] == 1e-2
    assert lines[1]["loss"] == 1.5 and lines[2]["step"] == 10
    assert lines[2]["loss"] == 0.5


def test_phase_timer():
    pt = PhaseTimer()
    with pt.phase("a"):
        x = jnp.ones((8, 8)) * 2
    out = pt.timed("b", lambda: jnp.ones((4,)).sum())
    s = pt.summary()
    assert s["a"]["count"] == 1 and s["b"]["mean_s"] > 0
    assert float(out) == 4.0


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 2))}}
    p = str(tmp_path / "ckpt")
    save(p, tree, metadata={"step": 7})
    back, meta = restore_with_meta(p)
    np.testing.assert_allclose(np.asarray(back["w"]), np.arange(4.0))
    assert meta == {"step": 7}


def test_harness_aggregation_and_latex(tmp_path, rng):
    preds = [jnp.asarray(rng.random((16, 16)).astype(np.float32)) for _ in range(3)]
    ms = evaluate_slices(preds, preds)
    agg = aggregate(ms)
    assert agg["ssim"]["mean"] > 0.999
    tex = latex_table({"light": ms}, "cap", "lab")
    assert "SSIM" in tex and "light" in tex and "\\pm" in tex
    save_report({"light": ms}, str(tmp_path), "immoco")
    data = json.load(open(tmp_path / "immoco.json"))
    assert "light" in data and len(data["light"]["per_slice"]) == 3


def test_method_comparison_figure(tmp_path, rng):
    gt = rng.random((32, 32)).astype(np.float32)
    out = str(tmp_path / "fig.png")
    scores = method_comparison_figure(
        gt, {"A": gt, "B": gt * 0.5 + 0.1 * rng.random((32, 32))}, out
    )
    assert os.path.exists(out)
    assert scores["A"]["ssim"] > scores["B"]["ssim"]


def test_weights_registry(tmp_path, monkeypatch):
    from miccai24_immoco_tpu import weights

    assert not weights.available("nonexistent-name") or True
    with pytest.raises(KeyError):
        weights.path_of("definitely-not-registered")
    # Register a temp checkpoint and load it back.
    import jax.numpy as jnp2

    p = str(tmp_path / "w")
    save(p, {"a": jnp2.ones(3)}, metadata={"k": 1})
    monkeypatch.setitem(weights.REGISTRY, "tmp", p)
    params, meta = weights.load("tmp")
    assert meta == {"k": 1}


def test_checkpoint_crash_recovery_meta(tmp_path):
    """A crash between save()'s two os.replace calls leaves only
    <path>.old_save; restore_with_meta must read tree AND metadata from the
    set-aside dir (reading meta from the missing primary returned {} and
    silently restarted resumed schedules from step 0)."""
    import os

    p = str(tmp_path / "ckpt")
    save(p, {"a": jnp.ones(3)}, metadata={"step": 7})
    save(p, {"a": jnp.ones(3) * 2}, metadata={"step": 9})
    os.replace(p, p + ".old_save")  # simulate the mid-swap crash window
    back, meta = restore_with_meta(p)
    assert meta == {"step": 9}
    np.testing.assert_allclose(np.asarray(back["a"]), 2.0)
