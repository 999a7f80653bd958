"""Checkpoint / resume via Orbax.

Replaces the reference's dual representation (HF save_pretrained +
accelerator.save_state, hma/train_multi.py:310-321) with one Orbax
checkpoint per step holding {params, opt_state, step} plus the model's
config.json alongside — still loadable for inference without the
optimizer. Retention is an explicit policy here; the reference pruned
old checkpoints from inside the *evaluator* with rm -rf
(hma/evaluate.py:130-137), which we deliberately do not replicate.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(output_dir: str, tag: str, state: Any, config=None,
                    keep_last: Optional[int] = None,
                    protect: tuple[str, ...] = ("final_checkpt",)) -> str:
    """Write output_dir/<tag>/{state/, config.json}. tag e.g. 'step_1000'.

    Multihost: every process must call this (Orbax coordinates the
    distributed array save); filesystem bookkeeping (mkdir/prune/config)
    runs on the primary only, with barriers around the stale-dir removal
    so no process starts writing into a directory another is deleting.
    """
    import jax

    primary = jax.process_index() == 0
    multiproc = jax.process_count() > 1
    out = Path(output_dir) / tag
    path = (out / "state").absolute()
    if primary:
        out.mkdir(parents=True, exist_ok=True)
        if path.exists():
            shutil.rmtree(path)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_pre_{tag}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if primary:
        if config is not None:
            config.save_pretrained(str(out / "config.json"))
        if keep_last:
            prune_checkpoints(output_dir, keep_last, protect)
    return str(out)


def _step_dirs(output_dir: str) -> list[tuple[float, Path]]:
    """Checkpoint dirs, oldest first.

    When every dir shares one prefix (the normal case), order by the
    counter — immune to mtime-scrambling copies (cp -r, gsutil/rsync).
    step_N and epoch_N counters are not comparable to each other, so a
    run that mixed checkpointing modes falls back to mtime recency."""
    out = Path(output_dir)
    dirs = []
    if not out.is_dir():
        return dirs
    for d in out.iterdir():
        m = re.fullmatch(r"(step|epoch)_(\d+)", d.name)
        if m and d.is_dir():
            dirs.append((m.group(1), int(m.group(2)), d))
    if len({kind for kind, _, _ in dirs}) <= 1:
        return [(float(n), d) for _, n, d in sorted(dirs, key=lambda x: x[1])]
    return sorted(((d.stat().st_mtime, d) for _, _, d in dirs))


def prune_checkpoints(output_dir: str, keep_last: int,
                      protect: tuple[str, ...] = ("final_checkpt",)) -> None:
    dirs = _step_dirs(output_dir)
    for _, d in dirs[:-keep_last] if keep_last > 0 else []:
        if d.name not in protect:
            shutil.rmtree(d, ignore_errors=True)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest step/epoch dir, or `final_checkpt` if present
    (reference resume discovery: hma/train_multi.py:490-504)."""
    final = Path(output_dir) / "final_checkpt"
    dirs = _step_dirs(output_dir)
    if dirs:
        return str(dirs[-1][1])
    if final.is_dir():
        return str(final)
    return None


def load_checkpoint(ckpt_dir: str, template: Any) -> Any:
    """Restore a pytree saved by `save_checkpoint` onto `template`'s
    structure/shardings."""
    ckptr = ocp.StandardCheckpointer()
    path = Path(ckpt_dir)
    if (path / "state").exists():
        path = path / "state"
    return ckptr.restore(path.absolute(), template)


def load_config_json(ckpt_dir: str):
    from hma_tpu.config import load_config

    p = Path(ckpt_dir) / "config.json"
    if not p.exists():
        p = Path(ckpt_dir).parent / "config.json"
    return load_config(str(p))
