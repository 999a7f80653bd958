"""End-to-end dynamics-generalization pipeline on CPU (the pytest-sized
copy of experiments/dynamics_probe.py, VERDICT r4 #1).

One test drives the REAL production path end to end on the procedural
toyworld: episode generation -> raw dataset write -> MagVit2 LFQ
tokenizer trained from scratch -> production encode + shard merge ->
STMaskGIT training with the C++ native loader -> evaluate.py on
HELD-OUT episodes (disjoint seed space), checking the two claims the
reference's quality loop is built on (hma/evaluate.py:324-376):

  - teacher-forced val PSNR beats the copy-last-frame baseline;
  - the action-trial dPSNR is positive (ground-truth actions beat
    perturbed actions — controllability).

The chip-scale artifact (experiments/artifacts/dynamics_r5_chip.json)
makes the same claims at 64² with AR-mode evaluation on real hardware;
this test keeps the loop honest on every commit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dynamics_pipeline_learns_heldout(tmp_path):
    from experiments.dynamics_probe import run_pipeline

    rec = run_pipeline(str(tmp_path), scale="test")

    # the from-scratch tokenizer reconstructs held-out frames usably
    assert rec["tokenizer_recon_psnr_val"] > 18.0, rec

    tf = rec["eval"]["teacher_forced"]
    # the model actually learned the token dynamics (not chance)
    assert tf["acc"] > 0.8, tf
    assert np.isfinite(tf["loss"])
    # claim 1: beats the no-dynamics baseline on held-out episodes
    assert tf["psnr_vs_copy"] > 0.0, tf
    # claim 2: controllability — true actions beat perturbed actions
    assert tf["delta_psnr"] > 0.0, tf

    ar = rec["eval"]["autoregressive"]
    assert np.isfinite(ar["psnr"]) and ar["psnr"] > 0, ar
