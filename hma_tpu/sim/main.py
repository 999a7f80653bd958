"""Offline interactive-world driver (reference: sim/main.py).

Steps a GenieSimulator with a scripted or random policy, saves the frame
sequence, and reports IQR-mean step latency. The reference's sim/main.py
imported a `sim.policy` module that does not exist (SURVEY.md §2.6);
here policies are plain callables.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

from hma_tpu.sim.simulator import GenieSimulator


class InteractiveDigitalWorld:
    """Step loop + video saving + timing stats (reference: sim/main.py:13-91)."""

    def __init__(self, simulator: GenieSimulator,
                 policy: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 save_dir: Optional[str] = None):
        self.sim = simulator
        self.policy = policy or (lambda obs: np.zeros(2, np.float32))
        self.save_dir = Path(save_dir) if save_dir else None
        self.frames: list[np.ndarray] = []

    def run(self, num_steps: int) -> dict:
        obs = self.sim.reset()
        self.frames = [np.asarray(obs)]
        for _ in range(num_steps):
            action = self.policy(obs)
            obs = self.sim.step(action)
            self.frames.append(np.asarray(obs))
        stats = self.sim.measure_step_time()
        if self.save_dir:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            np.save(self.save_dir / "frames.npy", np.stack(self.frames))
            try:
                from PIL import Image

                imgs = [Image.fromarray(f) for f in self.frames
                        if f.ndim == 3 and f.dtype == np.uint8]
                if imgs:
                    imgs[0].save(self.save_dir / "rollout.gif", save_all=True,
                                 append_images=imgs[1:], duration=200, loop=0)
            except Exception:
                pass
        return stats
