"""Threaded OpenCV frame viewer (reference: sim/viewer.py:12-68)."""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


class Viewer:
    """Displays frames pushed from another thread; no-ops headless."""

    def __init__(self, window_name: str = "hma_tpu", fps: int = 10):
        self.window_name = window_name
        self.fps = fps
        self._queue: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=4)
        self._thread: Optional[threading.Thread] = None
        self._ok = True

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def push(self, frame: np.ndarray):
        try:
            self._queue.put_nowait(np.asarray(frame))
        except queue.Full:
            pass

    def _loop(self):
        try:
            import cv2
        except ImportError:
            self._ok = False
            return
        while True:
            frame = self._queue.get()
            if frame is None:
                break
            try:
                cv2.imshow(self.window_name, frame[..., ::-1])  # RGB -> BGR
                cv2.waitKey(max(1, int(1000 / self.fps)))
            except Exception:
                self._ok = False
                break
        try:
            cv2.destroyWindow(self.window_name)
        except Exception:
            pass

    def close(self):
        self._queue.put(None)
        if self._thread:
            self._thread.join(timeout=2)
