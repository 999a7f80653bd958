"""EgoExo4D episode generator: wrist-pose pseudo-actions.

Rebuild of datasets/extern/egoexo4d.py: frames from ego-view takes,
actions = 3-D wrist positions from the hand-pose annotations. Root from
$EGOEXO4D_ROOT (the reference hardcodes /datasets01 paths,
egoexo4d.py:25-28).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from hma_tpu.data.encode_openx import get_shard_inds
from hma_tpu.data.extern.ego4d import _iter_clip_frames

EGOEXO4D_ROOT = os.environ.get("EGOEXO4D_ROOT", "/datasets/egoexo4d")


def wrist_action(pose_t1: dict) -> np.ndarray:
    """6-D action = next-frame left+right wrist positions."""

    def wrist(side):
        p = (pose_t1 or {}).get(f"{side}_wrist")
        return np.asarray(p if p else [0.0, 0.0, 0.0], np.float32)

    return np.concatenate([wrist("left"), wrist("right")])


def egoexo4d_episode_generator(shard_ind: int, num_shards: int,
                               root: str = EGOEXO4D_ROOT):
    ann_path = Path(root) / "annotations" / "hand_pose_train.json"
    if not ann_path.exists():
        raise FileNotFoundError(
            f"EgoExo4D annotations not found at {ann_path}; set $EGOEXO4D_ROOT")
    anns = json.loads(ann_path.read_text())
    takes = anns.get("takes", [])
    start, end = get_shard_inds(len(takes), num_shards, shard_ind)
    for take in takes[start:end]:
        video_path = str(Path(root) / "takes" / f"{take['take_uid']}.mp4")
        frames = take.get("frames", [])
        steps = []
        frame_iter = _iter_clip_frames(
            video_path, frames[0].get("frame", 0) if frames else 0,
            frames[-1].get("frame", 0) + 1 if frames else 0)
        for frame_ann, img in zip(frames, frame_iter):
            steps.append({"image": np.asarray(img),
                          "action": wrist_action(frame_ann.get("pose", {}))})
        if steps:
            yield {"steps": steps}
