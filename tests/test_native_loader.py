"""C++ native loader: build, structural invariants, throughput sanity."""

import shutil
import time

import numpy as np
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.data.datasets import write_token_dataset

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ compiler")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native") / "ds"
    rng = np.random.default_rng(0)
    N, h, w = 200, 4, 4
    video = rng.integers(0, 2**18, size=(N, h, w)).astype(np.uint32)
    segs = np.repeat(np.arange(N // 20), 20).astype(np.int32)
    actions = rng.normal(size=(N, 3)).astype(np.float32)
    write_token_dataset(d, video, segs, actions, {"name": "language_table"})
    return d, video, segs, actions


def make_config(**kw):
    d = dict(num_layers=1, num_heads=1, d_model=8, T=4, S=16,
             image_vocab_size=2**18, num_factored_vocabs=2,
             num_prompt_frames=2, use_actions=True)
    d.update(kw)
    return GenieConfig(**d)


def test_native_loader_batches(dataset_dir):
    from hma_tpu.data.native_loader import NativeTokenLoader

    d, video, segs, actions = dataset_dir
    cfg = make_config()
    loader = NativeTokenLoader(str(d), cfg, batch_size=8, stride=1, seed=1)
    assert loader.num_windows() > 0

    batch = loader.next_batch()
    assert batch["input_ids"].shape == (8, 4, 16)
    assert batch["labels"].shape == (8, 4, 16)
    assert batch["action_ids"].shape == (8, 4, 3)

    mask_id = cfg.image_vocab_size
    inp, lab = batch["input_ids"], batch["labels"]
    # labels are valid uncorrupted ids
    assert lab.max() < mask_id and lab.min() >= 0
    # frame 0 never masked; some masking occurred
    assert (inp[:, 0] != mask_id).all()
    assert (inp == mask_id).any()
    # unmasked-and-uncorrupted positions agree with labels for most tokens
    agree = ((inp == lab) | (inp == mask_id)).mean()
    assert agree > 0.6

    # every label window exists in the source video (check one row)
    found = False
    frame0 = lab[0, 0].reshape(4, 4).astype(np.uint32)
    for n in range(len(video)):
        if np.array_equal(video[n], frame0):
            found = True
            break
    assert found
    loader.close()


def test_native_loader_mask_statistics(dataset_dir):
    """Masked fraction over frames 1.. approximates E[cos(u*pi/2)] = 2/pi
    when only the MLM branch runs."""
    from hma_tpu.data.native_loader import NativeTokenLoader

    d, *_ = dataset_dir
    cfg = make_config(non_mlm_ratio=0.0, dataloader_apply_corruption=False)
    loader = NativeTokenLoader(str(d), cfg, batch_size=8, stride=1, seed=2)
    fracs = []
    for _ in range(50):
        b = loader.next_batch()
        fracs.append((b["input_ids"][:, 1:] == cfg.image_vocab_size).mean())
    assert abs(np.mean(fracs) - 2 / np.pi) < 0.06
    loader.close()


def test_native_loader_throughput(dataset_dir):
    from hma_tpu.data.native_loader import NativeTokenLoader

    d, *_ = dataset_dir
    cfg = make_config()
    loader = NativeTokenLoader(str(d), cfg, batch_size=32, stride=1,
                               num_threads=4, seed=3)
    loader.next_batch()
    t0 = time.perf_counter()
    n = 100
    for _ in range(n):
        loader.next_batch()
    dt = time.perf_counter() - t0
    bps = n / dt
    assert bps > 50, f"native loader too slow: {bps:.1f} batches/s"
    loader.close()


@pytest.fixture(scope="module")
def feature_dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nativef") / "ds"
    rng = np.random.default_rng(3)
    N, C, h, w = 200, 4, 4, 4
    lat = (rng.normal(size=(N, C, h, w)) * 2).astype(np.float16)
    segs = np.repeat(np.arange(N // 20), 20).astype(np.int32)
    actions = rng.normal(size=(N, 3)).astype(np.float32)
    write_token_dataset(d, lat, segs, actions,
                        {"name": "language_table", "latent_channels": C})
    return d, lat, segs, actions


def test_native_feature_loader_batches(feature_dataset_dir):
    """Continuous loader: shapes, fp16 decode x SVD_SCALE, action packing."""
    from hma_tpu.data.native_loader import NativeFeatureLoader
    from hma_tpu.tokenizer.svd_vae import SVD_SCALE

    d, lat, segs, actions = feature_dataset_dir
    cfg = make_config()
    loader = NativeFeatureLoader(str(d), cfg, batch_size=8, stride=1, seed=1)
    assert loader.num_windows() > 0
    batch = loader.next_batch()
    assert batch["input_ids"].shape == (8, 4, 4, 4, 4)
    assert batch["labels"].shape == (8, 4, 4, 4, 4)
    assert batch["masked_tokens_indicator"].shape == (8, 4, 4, 4)
    assert batch["action_ids"].shape == (8, 4, 3)
    # input latents are untouched (masking happens in-model via indicator)
    np.testing.assert_array_equal(batch["input_ids"], batch["labels"])

    # frame 0 never masked; something is masked
    m = batch["masked_tokens_indicator"]
    assert (m[:, 0] == 0).all() and (m == 1).any()
    assert set(np.unique(m)) <= {0, 1}

    # fp16 -> fp32 conversion must match numpy exactly, incl. SVD_SCALE
    # ((N,C,h,w) file layout -> (h,w,C) batch layout)
    ref = (lat.astype(np.float32) * SVD_SCALE).transpose(0, 2, 3, 1)
    frame0 = batch["labels"][0, 0]
    found = any(np.array_equal(ref[n], frame0) for n in range(len(ref)))
    assert found
    loader.close()


def test_native_feature_loader_mask_statistics(feature_dataset_dir):
    """Per-frame masked fraction ~ E[cos(pi/2 * (min + u(1-min)))]
    (the mask_ratio_min-floored cosine schedule, hma/data.py:120-143)."""
    from hma_tpu.data.native_loader import NativeFeatureLoader

    d, *_ = feature_dataset_dir
    cfg = make_config(non_mlm_ratio=0.0, dataloader_mask_ratio_min=0.1)
    loader = NativeFeatureLoader(str(d), cfg, batch_size=8, stride=1, seed=2)
    fracs = []
    for _ in range(60):
        b = loader.next_batch()
        fracs.append(b["masked_tokens_indicator"][:, 1:].mean())
    mn = 0.1
    import math
    expected = (2 / math.pi) * (1 - math.sin(mn * math.pi / 2)) / (1 - mn)
    assert abs(np.mean(fracs) - expected) < 0.06, (np.mean(fracs), expected)
    loader.close()


def test_native_feature_loader_throughput(feature_dataset_dir):
    """The C++ path must beat per-item Python collation comfortably."""
    from hma_tpu.data.native_loader import NativeFeatureLoader

    d, *_ = feature_dataset_dir
    cfg = make_config()
    loader = NativeFeatureLoader(str(d), cfg, batch_size=16, stride=1,
                                 seed=3, num_threads=1)
    loader.next_batch()  # warm
    t0 = time.time()
    n = 30
    for _ in range(n):
        loader.next_batch()
    dt = time.time() - t0
    loader.close()
    assert dt / n < 0.1, f"{dt / n * 1e3:.1f} ms/batch"


def _batches_equal(a: dict, b: dict) -> bool:
    return (set(a) == set(b)
            and all(np.array_equal(a[k], b[k]) for k in a))


def test_native_loader_deterministic_across_threads(dataset_dir):
    """Batch i is a pure function of (seed, i): the delivered sequence is
    identical regardless of worker-thread count (OrderedPrefetcher —
    the torch DataLoader's sampler-order contract, which the old
    free-for-all bounded queue did not give)."""
    from hma_tpu.data.native_loader import NativeTokenLoader

    d, *_ = dataset_dir
    cfg = make_config()
    mk = lambda nt: NativeTokenLoader(str(d), cfg, batch_size=4, stride=1,
                                      seed=7, num_threads=nt, queue_depth=3)
    a, b = mk(1), mk(4)
    for _ in range(12):
        assert _batches_equal(a.next_batch(), b.next_batch())
    a.close(), b.close()

    # different seed -> different stream (the check has teeth)
    c = NativeTokenLoader(str(d), cfg, batch_size=4, stride=1, seed=8)
    e = mk(1)
    assert not _batches_equal(e.next_batch(), c.next_batch())
    e.close(), c.close()


def test_native_loader_start_batch_resumes_sequence(dataset_dir):
    """start_batch=k yields exactly batches k, k+1, ... of a fresh run —
    the loader half of bit-exact native-path training resume
    (trainer.py replays the task stream to compute each loader's k)."""
    from hma_tpu.data.native_loader import NativeTokenLoader

    d, *_ = dataset_dir
    cfg = make_config()
    full = NativeTokenLoader(str(d), cfg, batch_size=4, stride=1, seed=11,
                             num_threads=2)
    ref = [full.next_batch() for _ in range(9)]
    full.close()
    resumed = NativeTokenLoader(str(d), cfg, batch_size=4, stride=1, seed=11,
                                num_threads=3, start_batch=5)
    for k in range(5, 9):
        assert _batches_equal(ref[k], resumed.next_batch()), k
    resumed.close()


def test_native_feature_loader_deterministic_and_resumable(feature_dataset_dir):
    """Same two contracts for the continuous (STMAR fp16 latent) loader."""
    from hma_tpu.data.native_loader import NativeFeatureLoader

    d, *_ = feature_dataset_dir
    cfg = make_config()
    a = NativeFeatureLoader(str(d), cfg, batch_size=4, stride=1, seed=5,
                            num_threads=1)
    b = NativeFeatureLoader(str(d), cfg, batch_size=4, stride=1, seed=5,
                            num_threads=4)
    ref = []
    for _ in range(8):
        x = a.next_batch()
        ref.append(x)
        assert _batches_equal(x, b.next_batch())
    a.close(), b.close()
    r = NativeFeatureLoader(str(d), cfg, batch_size=4, stride=1, seed=5,
                            num_threads=2, start_batch=6)
    assert _batches_equal(ref[6], r.next_batch())
    assert _batches_equal(ref[7], r.next_batch())
    r.close()
