"""Multi-host distributed training: 2 processes x 4 virtual CPU devices.

Validates the SPMD multi-process path (SURVEY.md §2.5/§5.8 — the
reference's torchrun 8-GPUs/node x 8-node scaling mapped to
jax.distributed.initialize + a global Mesh + per-host data feeding via
jax.make_array_from_process_local_data):

  - both processes see an 8-device global mesh and train in lockstep;
  - the loss trajectory is identical on every host (SPMD determinism);
  - only the primary host writes metrics.jsonl;
  - the Orbax final checkpoint is written cooperatively.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from hma_tpu.config import GenieConfig
from hma_tpu.data.datasets import write_token_dataset


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mh_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    data = root / "data"
    rng = np.random.default_rng(0)
    domain = "language_table"
    vocab = 2**18
    h = w = 4
    for split, n in [("train", 80), ("val", 40)]:
        video = rng.integers(0, vocab, size=(n, h, w)).astype(np.uint32)
        segs = np.repeat(np.arange(n // 10), 10).astype(np.int32)
        actions = rng.normal(size=(n, 2)).astype(np.float32)
        write_token_dataset(data / f"{domain}_magvit_max1000000_{split}",
                            video, segs, actions,
                            {"name": domain, "vocab_size": vocab, "s": h * w})
    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=vocab, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True)
    cfg.save_pretrained(str(root / "config.json"))
    with open(root / "datasplit.yaml", "w") as f:
        yaml.safe_dump({"domains": domain}, f)
    return root


def test_two_process_training(mh_env):
    root = mh_env
    port = _free_port()
    driver = Path(__file__).parent / "multihost_driver.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["HMA_TPU_COORDINATOR"] = f"localhost:{port}"
        env["HMA_TPU_NUM_PROCESSES"] = "2"
        env["HMA_TPU_PROCESS_ID"] = str(pid)
        # the driver runs as a script (sys.path[0] = tests/), so the repo
        # root must come from PYTHONPATH for `import hma_tpu` to resolve
        repo_root = str(Path(__file__).parents[1])
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, str(driver), str(root)],
            env=env, cwd=str(Path(__file__).parents[1]),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]

    # identical SPMD loss trajectory on both hosts
    finals = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")][0]
        pid, payload = line.split(" ", 2)[1:]
        finals[int(pid)] = json.loads(payload)
    assert set(finals) == {0, 1}
    np.testing.assert_allclose(finals[0]["loss"], finals[1]["loss"], rtol=1e-5)

    # cross-process sharded eval: in-jit reduction must yield identical
    # replicated metrics on both processes
    evals = {}
    for out in outs:
        line = [l for l in out.splitlines()
                if l.startswith("MULTIHOST_EVAL_OK")][0]
        pid, payload = line.split(" ", 2)[1:]
        evals[int(pid)] = json.loads(payload)
    assert set(evals) == {0, 1}
    assert evals[0]["num_examples"] == 16
    for k in ("loss", "perplexity", "acc"):
        np.testing.assert_allclose(evals[0][k], evals[1][k], rtol=1e-6,
                                   err_msg=k)

    # primary-only logging; cooperative Orbax checkpoint
    out_dir = root / "out"
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    losses = [l["train/loss"] for l in lines if "train/loss" in l]
    assert losses, "primary host wrote no train metrics"
    assert (out_dir / "final_checkpt" / "state").is_dir()
    assert (out_dir / "final_checkpt" / "config.json").is_file()
