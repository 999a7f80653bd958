"""Experiment metric logging: wandb when available, JSONL always.

The reference logs everything to wandb across three projects
(SURVEY.md §5.5; hma/train_multi.py:782, evaluate.py:243,
visualize.py:226). wandb is optional here — every run also writes
`metrics.jsonl` so headless/offline runs keep full observability.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Optional


class MetricLogger:
    def __init__(self, output_dir: str, project: str = "video",
                 config: Optional[dict] = None, use_wandb: bool = True,
                 enabled: bool = True):
        """`enabled=False` (non-primary hosts in a multi-process run) makes
        every method a cheap no-op so call sites stay branch-free."""
        self.enabled = enabled
        self._fh = None
        self._wandb = None
        if not enabled:
            return
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.output_dir / "metrics.jsonl", "a")
        if use_wandb and os.environ.get("WANDB_DISABLED", "").lower() != "true":
            try:
                import wandb

                self._wandb = wandb.init(project=project, config=config or {},
                                         dir=str(self.output_dir))
            except Exception:
                self._wandb = None
        if config:
            self._fh.write(json.dumps({"_config": _jsonable(config),
                                       "_ts": time.time()}) + "\n")
            self._fh.flush()

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        if not self.enabled:
            return
        rec = {k: _jsonable(v) for k, v in metrics.items()}
        if step is not None:
            rec["_step"] = int(step)
        rec["_ts"] = time.time()
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception:
                pass

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(v: Any):
    try:
        json.dumps(v)
        return v
    except TypeError:
        if hasattr(v, "item") and getattr(v, "size", 2) == 1:
            return v.item()
        if hasattr(v, "tolist"):
            try:
                return v.tolist()
            except Exception:
                return str(v)
        return str(v)
