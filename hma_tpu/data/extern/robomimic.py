"""robomimic episode generator: replays HDF5 demos through the sim env.

Rebuild of datasets/extern/robomimic.py (whose `sim.robomimic` import
never existed in the reference — SURVEY.md §2.6): demos are replayed
through robosuite/MuJoCo to render frames, with the recorded actions.
Requires robomimic + h5py; root from $ROBOMIMIC_ROOT.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from hma_tpu.data.encode_openx import get_shard_inds

ROBOMIMIC_ROOT = os.environ.get("ROBOMIMIC_ROOT", "/datasets/robomimic")


def robomimic_episode_generator(shard_ind: int, num_shards: int,
                                root: str = ROBOMIMIC_ROOT,
                                task: str = "lift", camera: str = "agentview",
                                image_size: int = 256):
    import h5py  # optional deps
    import robomimic.utils.env_utils as EnvUtils
    import robomimic.utils.file_utils as FileUtils

    hdf5 = Path(root) / task / "ph" / "demo_v141.hdf5"
    if not hdf5.exists():
        raise FileNotFoundError(f"robomimic demos not found at {hdf5}")

    env_meta = FileUtils.get_env_metadata_from_dataset(str(hdf5))
    env = EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=False, render_offscreen=True)

    with h5py.File(hdf5, "r") as f:
        demos = sorted(f["data"].keys())
        start, end = get_shard_inds(len(demos), num_shards, shard_ind)
        for demo in demos[start:end]:
            grp = f["data"][demo]
            env.reset()
            env.reset_to({"states": grp["states"][0]})
            steps = []
            for action in np.asarray(grp["actions"]):
                env.step(action)
                img = env.render(mode="rgb_array", height=image_size,
                                 width=image_size, camera_name=camera)
                steps.append({"image": np.asarray(img),
                              "action": np.asarray(action, np.float32)})
            if steps:
                yield {"steps": steps}
