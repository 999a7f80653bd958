"""Ego4D episode generator: clips + hand-bbox pseudo-actions.

Rebuild of datasets/extern/ego4d.py: video clips are decoded with cv2;
per-frame hand bounding-box annotations become 4-D "hand-center" pseudo
actions (cx_left, cy_left, cx_right, cy_right deltas, reference:
compute_state_and_actions, ego4d.py:49+). Dataset root comes from
$EGO4D_ROOT instead of the reference's hardcoded /datasets01 paths.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from hma_tpu.data.encode_openx import get_shard_inds

EGO4D_ROOT = os.environ.get("EGO4D_ROOT", "/datasets/ego4d")


def compute_state_and_actions(boxes_t: dict, boxes_t1: dict) -> np.ndarray:
    """4-D action = next-frame hand centers (left + right), normalized."""

    def center(box):
        if not box:
            return np.asarray([0.5, 0.5], np.float32)
        return np.asarray([(box["x1"] + box["x2"]) / 2,
                           (box["y1"] + box["y2"]) / 2], np.float32)

    return np.concatenate([center(boxes_t1.get("left_hand")),
                           center(boxes_t1.get("right_hand"))])


def _iter_clip_frames(video_path: str, start_frame: int, end_frame: int):
    import cv2

    cap = cv2.VideoCapture(video_path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
    for _ in range(start_frame, end_frame):
        ok, frame = cap.read()
        if not ok:
            break
        yield frame[..., ::-1]  # BGR -> RGB
    cap.release()


def ego4d_episode_generator(shard_ind: int, num_shards: int,
                            root: str = EGO4D_ROOT):
    """Yields {"steps": [{"image", "action"}, ...]} per annotated clip."""
    ann_path = Path(root) / "annotations" / "fho_hands_train.json"
    if not ann_path.exists():
        raise FileNotFoundError(
            f"Ego4D annotations not found at {ann_path}; set $EGO4D_ROOT")
    anns = json.loads(ann_path.read_text())
    clips = anns.get("clips", anns.get("videos", []))
    start, end = get_shard_inds(len(clips), num_shards, shard_ind)
    for clip in clips[start:end]:
        video_path = str(Path(root) / "clips" / f"{clip['clip_uid']}.mp4")
        frames = clip.get("frames", [])
        steps = []
        frame_iter = _iter_clip_frames(
            video_path, frames[0].get("frame", 0) if frames else 0,
            frames[-1].get("frame", 0) + 1 if frames else 0)
        prev_boxes: dict = {}
        for frame_ann, img in zip(frames, frame_iter):
            boxes = frame_ann.get("boxes", {})
            steps.append({"image": np.asarray(img),
                          "action": compute_state_and_actions(prev_boxes, boxes)})
            prev_boxes = boxes
        if steps:
            yield {"steps": steps}
