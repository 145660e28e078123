"""Experiment tracking.

The reference logs scalars/images to Weights & Biases in every training
script (SURVEY.md C26).  This module provides the same logging surface with
pluggable backends: JSONL on disk (always available, machine-readable),
stdout, and wandb when the package is importable (it is not part of this
framework's baked dependencies).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Tracker:
    """wandb-shaped logger: Tracker(project=..., name=...).log({...})."""

    def __init__(
        self,
        project: str,
        name: str = "run",
        group: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        out_dir: str = "results/runs",
        use_wandb: Optional[bool] = None,
        echo: bool = False,
    ):
        self.project = project
        self.name = name
        self.echo = echo
        self._step = 0
        stamp = time.strftime("%Y%m%d-%H%M%S")
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{project}_{name}_{stamp}.jsonl")
        self._file = open(self.path, "a")
        if config:
            self._write({"_event": "config", **_jsonable(config)})

        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("IMMOCO_WANDB", "0") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, group=group, name=name, config=config
                )
            except Exception:
                self._wandb = None

    def _write(self, record: Dict[str, Any]) -> None:
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        record = {"step": step, "time": time.time(), **_jsonable(metrics)}
        self._write(record)
        if self.echo:
            print(json.dumps(record))
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(d: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            try:
                out[k] = float(v)
            except Exception:
                out[k] = str(v)
    return out
