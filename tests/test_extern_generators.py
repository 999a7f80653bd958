"""Extern dataset generators on synthesized annotation fixtures.

Each fixture mirrors the reference's real annotation format (VERDICT r2
item 7): Ego4D fho_main.json narrated actions with hand boxes
(reference: datasets/extern/ego4d.py:151-226), EgoExo4D per-frame hand
poses keyed by frame index (egoexo4d.py:97-199), EPIC-KITCHENS
hand-object detections with side labels (epic_kitchen.py:33-113), and
robomimic HDF5-style demos with flattened MuJoCo states
(robomimic.py:36-79). Video/frame/env IO is injected so the action
math, chunking, and skip rules are tested hermetically.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

from hma_tpu.data.extern import ego4d, egoexo4d, epic_kitchen, robomimic

IMG = np.zeros((256, 256, 3), np.uint8)


# ---------------------------------------------------------------- ego4d


def _box(obj_type, x, y, w=10.0, h=10.0):
    return {"object_type": obj_type,
            "bbox": {"x": x, "y": y, "width": w, "height": h}}


def _fho_frame(n, lx, ly, rx, ry):
    return {"frame_number": n,
            "boxes": [_box("left_hand", lx, ly), _box("right_hand", rx, ry),
                      _box("object_of_change", 0, 0)]}


def test_ego4d_state_action_math():
    curr = [_box("left_hand", 59, 59, 10, 10), _box("right_hand", 123, 59, 10, 10)]
    nxt = [_box("left_hand", 187, 123, 10, 10), _box("right_hand", 251, 187, 10, 10)]
    state, action = ego4d.compute_state_and_actions(IMG, curr, nxt)
    # centers = corner + size/2, normalized by 256
    np.testing.assert_allclose(state, [0.25, 0.25, 0.5, 0.25])
    # actions are absolute next-frame centers, NOT deltas
    np.testing.assert_allclose(action, [0.75, 0.5, 1.0, 0.75])
    # missing a hand -> None
    assert ego4d.compute_state_and_actions(IMG, curr[:1], nxt) is None


def test_ego4d_chunking_drops_partial():
    actions = [{"frames": [i]} for i in range(10)]
    chunks = ego4d.chunk_actions_and_concatenate(actions)
    # 10 actions -> chunks of 4 -> [0:4],[4:8] kept, [8:10] partial dropped
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_ego4d_iter_episodes(tmp_path, monkeypatch):
    monkeypatch.setattr(ego4d, "parse_video_frame", lambda p, n: IMG.copy())
    (tmp_path / "vid0.mp4").write_bytes(b"")
    # one chunk of 4 actions whose frames give >= MIN_STEPS valid pairs
    nframes = ego4d.MIN_STEPS + 4  # 4 actions x 5 frames -> 19 step pairs
    frames = [_fho_frame(i + 1, 10 + i, 20, 100, 120) for i in range(nframes)]
    per_action = nframes // 4
    actions = [{"is_invalid_annotation": False, "is_rejected": False,
                "stage": "done",
                "frames": frames[i * per_action:(i + 1) * per_action]}
               for i in range(4)]
    # a 5th action forces a dropped partial chunk; rejected ones filtered
    actions += [{"is_invalid_annotation": False, "is_rejected": True,
                 "stage": "done", "frames": frames},
                {"is_invalid_annotation": False, "is_rejected": False,
                 "stage": "done", "frames": frames}]
    labels = {"videos": [{
        "video_uid": "vid0",
        "annotated_intervals": [{"narrated_actions": actions}],
    }]}
    eps = list(ego4d.iter_episodes(labels, str(tmp_path)))
    assert len(eps) == 1
    steps = eps[0]["steps"]
    assert len(steps) >= ego4d.MIN_STEPS
    assert steps[0]["image"].shape == (256, 256, 3)
    assert steps[0]["action"].shape == (4,)
    # short clips are skipped entirely
    labels["videos"][0]["annotated_intervals"][0]["narrated_actions"] = \
        actions[:3]  # 3 actions -> 0 full chunks after the partial drop...
    labels2 = {"videos": [{"video_uid": "vid0", "annotated_intervals": [
        {"narrated_actions": [dict(a, frames=frames[:3]) for a in actions[:4]]}]}]}
    assert list(ego4d.iter_episodes(labels2, str(tmp_path))) == []


# -------------------------------------------------------------- egoexo4d


def _pose(lx, ly, rx, ry):
    return [{"annotation2D": {"cam01": {
        "left_wrist": {"x": lx, "y": ly},
        "right_wrist": {"x": rx, "y": ry}}}}]


def test_egoexo4d_chunking_and_actions():
    n = 30
    frames = [IMG.copy() for _ in range(n)]
    detections = {str(i): _pose(64 + i, 64, 192, 128) for i in range(n)}
    del detections["12"]  # gap splits the take into two chunks
    eps = list(egoexo4d.iter_take_episodes(frames, detections, min_clip=8))
    assert len(eps) == 2
    s0 = eps[0]["steps"][0]
    np.testing.assert_allclose(s0["state"], [0.25, 0.25, 0.75, 0.5])
    # absolute next-frame wrists
    np.testing.assert_allclose(s0["action"], [65 / 256, 0.25, 0.75, 0.5])
    # chunks below min_clip are dropped
    eps_strict = list(egoexo4d.iter_take_episodes(frames, detections,
                                                  min_clip=20))
    assert eps_strict == []


def test_egoexo4d_missing_wrist_ends_chunk():
    frames = [IMG.copy() for _ in range(20)]
    detections = {str(i): _pose(10, 10, 20, 20) for i in range(20)}
    detections["9"] = [{"annotation2D": {"cam01": {}}}]  # wrists missing
    eps = list(egoexo4d.iter_take_episodes(frames, detections, min_clip=4))
    # continuity is intact (labels exist) but the pose read fails -> break
    assert all(len(e["steps"]) >= 4 for e in eps)


# ----------------------------------------------------------- epic_kitchen


def _epic_frame(lc, rc, flip=False):
    hands = [{"side": "left", "center": lc}, {"side": "right", "center": rc}]
    if flip:
        hands = hands[::-1]
    return {"hands": hands}


def test_epic_kitchen_delta_actions(monkeypatch):
    monkeypatch.setattr(epic_kitchen, "read_frame", lambda d, i: IMG.copy())
    det = [
        _epic_frame((0.2, 0.3), (0.6, 0.7)),
        _epic_frame((0.25, 0.35), (0.55, 0.65), flip=True),  # side-ordered
        {"hands": [{"side": "left", "center": (0.0, 0.0)}]},  # skipped (1 hand)
        _epic_frame((0.3, 0.4), (0.5, 0.6)),
    ]
    ep = epic_kitchen.iter_video_episode("unused", det)
    steps = ep["steps"]
    assert len(steps) == 1  # only the 0->1 pair has 2 hands on both sides
    np.testing.assert_allclose(steps[0]["state"], [0.2, 0.3, 0.6, 0.7])
    # EPIC actions are DELTAS (unlike ego4d), left then right
    np.testing.assert_allclose(steps[0]["action"],
                               [0.05, 0.05, -0.05, -0.05], atol=1e-6)


# ------------------------------------------------------------- robomimic


class _StubSim:
    def __init__(self):
        self.states = []

    def set_state_from_flattened(self, s):
        self.states.append(np.asarray(s).copy())

    def forward(self):
        pass


class _StubEnv:
    def __init__(self):
        self.sim = _StubSim()

    def render(self, mode="rgb_array", height=256, width=256, camera_name=""):
        # encode the last restored state's first element into the frame
        v = int(self.sim.states[-1][0]) % 255
        return np.full((height, width, 3), v, np.uint8)


def test_robomimic_replay_demo():
    T = 5
    demo = {
        "obs": {"object": np.ones((T, 10), np.float32),
                "robot0_eef_pos": np.zeros((T, 3), np.float32),
                "robot0_eef_quat": np.zeros((T, 4), np.float32),
                "robot0_gripper_qpos": np.zeros((T, 2), np.float32)},
        "states": np.arange(T)[:, None].repeat(4, 1).astype(np.float64),
        "actions": np.linspace(0, 1, T * 7).reshape(T, 7),
    }
    env = _StubEnv()
    ep = robomimic.replay_demo(env, demo, image_size=256, env_name="lift")
    steps = ep["steps"]
    assert len(steps) == T
    assert steps[0]["state"].shape == (19,)  # 10 + 3 + 4 + 2
    assert steps[0]["language"] == "lift"
    # frames were rendered from the *restored* states, in order
    assert steps[3]["image"][0, 0, 0] == 3
    assert len(env.sim.states) == T
    np.testing.assert_allclose(steps[-1]["action"], demo["actions"][-1])
