"""Memmap-backed token / latent / image datasets.

On-disk contract is byte-identical to the reference's
(`video.bin` + `segment_ids.bin` + `actions/*.bin` + `metadata.json`,
reference: hma/data.py:159-567 and datasets/encode_openx_dataset.py:340),
so datasets encoded by either framework are interchangeable. Readers are
pure numpy — no torch — and return numpy dicts consumed by the collators.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

from hma_tpu.data.freq_table import DATA_FREQ_TABLE

SVD_SCALE = 0.18215  # SVD-VAE latent scale (reference: hma/data.py:16)


def normalize_actions(actions: np.ndarray):
    """Per-dim mean/std stats; normalization itself happens in the network
    (reference: hma/data.py:18-24)."""
    mean = np.mean(actions, axis=0).tolist()
    std = np.std(actions, axis=0).tolist()
    return actions, [mean, std]


class _MemmapVideoDataset:
    """Shared machinery: metadata, memmaps, stride, window index filtering."""

    #: subclasses set: data shape, token dtype default
    def _open(self, data_dir, window_size, stride, filter_interrupts,
              filter_overlaps, use_actions, name, max_traj_num,
              compute_stride_from_freq_table, natural_hz, shape_fn,
              default_dtype, limit_by_segment=False):
        data_dir = Path(data_dir)
        with open(data_dir / "metadata.json") as f:
            self.metadata = json.load(f)

        token_dtype = np.dtype(self.metadata.get("token_dtype", default_dtype))
        shape = shape_fn(self.metadata)
        self.data = np.memmap(data_dir / "video.bin", dtype=token_dtype, mode="r", shape=shape)
        self.window_size, self.stride = window_size, stride
        self.name = name if name else self.metadata["name"]
        self.name = self.name.replace("_noquant", "")

        if compute_stride_from_freq_table:
            self.stride = max(DATA_FREQ_TABLE.get(self.name, 1) // natural_hz, 1)
        self.n_action = self.metadata.get("action_dim", 1) * self.stride

        if use_actions:
            actions = []
            for action_file in sorted((data_dir / "actions").iterdir()):
                actions.append(np.memmap(action_file, dtype=np.float32, mode="r").reshape(len(self.data), -1))
            self.actions = np.concatenate(actions, axis=-1)
            self.actions, self.action_stat = normalize_actions(self.actions)
        else:
            self.actions = None

        seg_path = data_dir / "segment_ids.bin"
        if os.path.isfile(seg_path):
            self.segment_ids = np.memmap(seg_path, dtype=np.int32, mode="r",
                                         shape=(self.metadata["num_images"],))
        else:
            self.segment_ids = None
            if filter_interrupts:
                raise NotImplementedError("Cannot filter interrupted sequences without segment ids.")

        self.video_len = (self.window_size - 1) * self.stride
        n = len(self.data) - self.video_len - self.stride
        valid = []
        for start_ind in range(max(n, 0)):
            if not (filter_interrupts and
                    self.segment_ids[start_ind] != self.segment_ids[start_ind + self.video_len]):
                valid.append(start_ind)
            if limit_by_segment:
                if self.segment_ids is not None and self.segment_ids[start_ind] >= max_traj_num:
                    break
            elif len(valid) >= max_traj_num:
                break

        if filter_overlaps:
            filtered = []
            for start_ind in valid:
                overlapping = {start_ind - i * self.stride for i in range(1, self.window_size)}
                for existing in filtered[-self.window_size * self.stride:]:
                    if existing in overlapping:
                        break
                else:
                    filtered.append(start_ind)
            valid = filtered

        self.valid_start_inds = np.asarray(valid, dtype=np.int64)

    def __len__(self):
        return len(self.valid_start_inds)

    def _action_window(self, start_ind: int) -> np.ndarray:
        """(window_size, action_dim*stride): all intra-stride actions
        (reference: hma/data.py:286-291)."""
        a = self.actions[start_ind: start_ind + self.video_len + self.stride]
        return np.asarray(a, dtype=np.float32).reshape(self.window_size, -1)


class RawTokenDataset(_MemmapVideoDataset):
    """uint32 (N, h, w) discrete MagVit2 tokens (reference: hma/data.py:159)."""

    def __init__(self, data_dir, window_size, stride=1, filter_interrupts=True,
                 filter_overlaps=False, use_actions=False, name="",
                 max_traj_num=1_000_000, compute_stride_from_freq_table=True,
                 natural_hz=2, drop_action_ratio=0.0, rng: Optional[np.random.Generator] = None):
        self.drop_action_ratio = drop_action_ratio
        self._rng = rng or np.random.default_rng()
        self._open(data_dir, window_size, stride, filter_interrupts,
                   filter_overlaps, use_actions, name, max_traj_num,
                   compute_stride_from_freq_table, natural_hz,
                   lambda m: (m["num_images"], m["h"], m["w"]), "uint32",
                   limit_by_segment=True)

    def __getitem__(self, idx):
        start = int(self.valid_start_inds[idx])
        x = np.asarray(self.data[start: start + self.video_len + 1: self.stride], dtype=np.int64)
        d = {
            "input_ids": x.reshape(-1),
            "labels": x.reshape(-1),
            "h": self.metadata["h"],
            "w": self.metadata["w"],
            "domain": self.name,
        }
        if self.actions is not None and self._rng.uniform() > self.drop_action_ratio:
            d["action_ids"] = self._action_window(start)
        return d


class RawFeatureDataset(_MemmapVideoDataset):
    """float16 (N, C, h, w) continuous VAE latents, x SVD_SCALE on read
    (reference: hma/data.py:298).

    drop_action_ratio extends the reference (which supports action
    dropping only for the discrete family, train_multi.py:838-839): our
    STMAR forward handles action_ids=None, and dropped training is what
    calibrates the classifier-free-guidance uncond branch
    (rollout/mar.py)."""

    def __init__(self, data_dir, window_size, stride=1, filter_interrupts=True,
                 filter_overlaps=False, use_actions=False,
                 max_traj_num=1_000_000, compute_stride_from_freq_table=True,
                 natural_hz=2, datio_noise_ratio=0.0, domain=None,
                 drop_action_ratio=0.0,
                 rng: Optional[np.random.Generator] = None):
        self.datio_noise_ratio = datio_noise_ratio
        self.drop_action_ratio = drop_action_ratio
        self._rng = rng or np.random.default_rng(0)
        self._open(data_dir, window_size, stride, filter_interrupts,
                   filter_overlaps, use_actions, domain or "", max_traj_num,
                   compute_stride_from_freq_table, natural_hz,
                   lambda m: (m["num_images"], m.get("latent_channels", 4), m["h"], m["w"]),
                   "float16")

    def __getitem__(self, idx):
        start = int(self.valid_start_inds[idx])
        x = np.asarray(self.data[start: start + self.video_len + 1: self.stride], dtype=np.float32)
        x = x * SVD_SCALE
        # (t, c, h, w) -> (t*h*w, c)
        t, c, h, w = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(t * h * w, c)
        d = {
            "input_ids": x,
            "labels": x.copy(),
            "h": self.metadata["h"],
            "w": self.metadata["w"],
            "c": self.metadata["latent_channels"],
            "domain": self.name,
        }
        if self.actions is not None and self._rng.uniform() > self.drop_action_ratio:
            d["action_ids"] = self._action_window(start)
        return d


class RawImageDataset(_MemmapVideoDataset):
    """uint8 (N, h, w, 3) raw frames (reference: hma/data.py:437)."""

    def __init__(self, data_dir, window_size, stride=1, filter_interrupts=True,
                 filter_overlaps=False, use_actions=False,
                 max_traj_num=1_000_000, compute_stride_from_freq_table=True,
                 natural_hz=2, datio_noise_ratio=0.0, domain=None):
        self.datio_noise_ratio = datio_noise_ratio
        self._open(data_dir, window_size, stride, filter_interrupts,
                   filter_overlaps, use_actions, domain or "", max_traj_num,
                   compute_stride_from_freq_table, natural_hz,
                   lambda m: (m["num_images"], m["h"], m["w"], 3), "uint8")

    def __getitem__(self, idx):
        start = int(self.valid_start_inds[idx])
        x = np.asarray(self.data[start: start + self.video_len + 1: self.stride], dtype=np.float32)
        d = {
            "images": x,
            "labels": x.copy(),
            "h": self.metadata["h"],
            "w": self.metadata["w"],
            "domain": self.name,
        }
        if self.actions is not None:
            d["action_ids"] = self._action_window(start)
        return d


def write_token_dataset(out_dir, video: np.ndarray, segment_ids: np.ndarray,
                        actions: Optional[np.ndarray], metadata: dict) -> None:
    """Write a dataset directory in the shared on-disk format."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    video.tofile(out / "video.bin")
    segment_ids.astype(np.int32).tofile(out / "segment_ids.bin")
    if actions is not None:
        (out / "actions").mkdir(exist_ok=True)
        actions.astype(np.float32).tofile(out / "actions" / "actions.bin")
        metadata = {**metadata, "action_dim": int(actions.shape[-1])}
    # token layout (N, h, w); image layout (N, h, w, 3); latent (N, C, h, w)
    if video.ndim == 3 or video.shape[-1] == 3:
        h, w = video.shape[1], video.shape[2]
    else:  # latent (N, C, h, w)
        h, w = video.shape[2], video.shape[3]
    meta = {
        "num_images": int(video.shape[0]),
        "h": int(h),
        "w": int(w),
        "token_dtype": str(video.dtype),
        **metadata,
    }
    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)
