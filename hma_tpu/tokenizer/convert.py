"""Torch-checkpoint import for the MagVit2 tokenizer.

Maps the reference's NCHW torch state dict (external/magvit2/models/
lfqgan.py, checkpoint `magvit2.ckpt` from HF 1x-technologies/worldmodel)
onto the Flax NHWC VQModel. EMA shadow weights (LitEma, stored under
`model_ema.*` with dots stripped from parameter names) are preferred when
present, since the reference encodes/decodes under `ema_scope()`
(datasets/utils.py:123, external/magvit2/models/lfqgan.py:63-76).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _torch_to_flax_name(name: str):
    """Map a torch parameter path to (flax_path_tuple, kind).

    kind: 'conv' | 'norm_scale' | 'norm_bias' | 'bias'
    Returns None for parameters we don't import (quantizer buffers, loss
    nets, discriminator).
    """
    parts = name.split(".")
    if parts[0] not in ("encoder", "decoder"):
        return None
    top = parts[0]
    rest = parts[1:]
    leaf = rest[-1]

    def conv_entry(path):
        kind = "conv" if leaf == "weight" else "bias"
        return (top, *path, "kernel" if leaf == "weight" else "bias"), kind

    def norm_entry(path):
        kind = "norm_scale" if leaf == "weight" else "norm_bias"
        return (top, *path, "scale" if leaf == "weight" else "bias"), kind

    body = rest[:-1]
    key = ".".join(body)

    m = re.fullmatch(r"down\.(\d+)\.block\.(\d+)\.(\w+)", key)
    if m:
        i, j, sub = m.group(1), m.group(2), m.group(3)
        path = (f"down_{i}_block_{j}", sub)
        return norm_entry(path) if sub.startswith("norm") else conv_entry(path)
    m = re.fullmatch(r"down\.(\d+)\.downsample", key)
    if m:
        return conv_entry((f"down_{m.group(1)}_downsample",))
    m = re.fullmatch(r"up\.(\d+)\.block\.(\d+)\.(\w+)", key)
    if m:
        i, j, sub = m.group(1), m.group(2), m.group(3)
        path = (f"up_{i}_block_{j}", sub)
        return norm_entry(path) if sub.startswith("norm") else conv_entry(path)
    m = re.fullmatch(r"up\.(\d+)\.upsample\.conv1", key)
    if m:
        return conv_entry((f"up_{m.group(1)}_upsample", "conv1"))
    m = re.fullmatch(r"mid_block\.(\d+)\.(\w+)", key)
    if m:
        j, sub = m.group(1), m.group(2)
        path = (f"mid_block_{j}", sub)
        return norm_entry(path) if sub.startswith("norm") else conv_entry(path)
    if key == "conv_in":
        return conv_entry(("conv_in",))
    if key == "conv_out":
        return conv_entry(("conv_out",))
    if key == "norm_out":
        return norm_entry(("norm_out",))
    return None


def _resolve_ema(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Overlay LitEma shadow weights (keys 'model_ema.<name with dots stripped>')
    onto their originals (reference: external/magvit2/modules/ema.py:11-40)."""
    ema = {k[len("model_ema."):]: v for k, v in state_dict.items()
           if k.startswith("model_ema.") and k not in
           ("model_ema.num_updates", "model_ema.decay")}
    if not ema:
        return state_dict
    out = dict(state_dict)
    for name in list(state_dict):
        stripped = name.replace(".", "")
        if stripped in ema:
            out[name] = ema[stripped]
    return out


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray],
                             use_ema: bool = True) -> dict:
    """Build the nested flax params dict {'params': {...}} for VQModel."""
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    if use_ema:
        state_dict = _resolve_ema(state_dict)

    params: dict = {}
    for name, value in state_dict.items():
        mapped = _torch_to_flax_name(name)
        if mapped is None:
            continue
        path, kind = mapped
        if kind == "conv":
            value = _conv_w(value)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value.astype(np.float32)
    return {"params": params}


def load_magvit2(ckpt_path: str, use_ema: bool = True):
    """Load a MagVit2 checkpoint plus its architecture config.

    Accepts either the reference's torch `.ckpt` file OR a directory
    written by `hma_tpu.train_tokenizer` (orbax state + `vq_config.json`
    sidecar) — the same loader serves imported and natively-trained
    tokenizers, so `evaluate.py --tokenizer_ckpt` and the encode CLIs
    work with both.

    Returns (flax_params, VQConfig). For torch files the config comes
    from a sidecar JSON — `<ckpt_path>.json` or `vq_config.json` next to
    the checkpoint (written by `VQConfig.save_pretrained`) — and falls
    back to the default `VQConfig()`, which is the architecture of the
    released magvit2.ckpt (reference: external/magvit2/config.py:10-44).
    Fixture checkpoints with non-default shapes ship the sidecar.
    """
    import os

    from hma_tpu.tokenizer.magvit2 import VQConfig

    if os.path.isdir(ckpt_path):
        return load_magvit2_native(ckpt_path, use_ema=use_ema)
    params = load_magvit2_checkpoint(ckpt_path, use_ema=use_ema)
    for cand in (ckpt_path + ".json",
                 os.path.join(os.path.dirname(os.path.abspath(ckpt_path)),
                              "vq_config.json")):
        if os.path.exists(cand):
            return params, VQConfig.from_pretrained(cand)
    return params, VQConfig()


def load_magvit2_native(ckpt_dir: str, use_ema: bool = True):
    """Load an hma_tpu-trained tokenizer checkpoint directory.

    `ckpt_dir` is either a tagged checkpoint (contains `state/`) or a
    train_tokenizer output dir (the newest step / `final_checkpt` tag is
    picked). The saved tree is {"gen": params, "ema": shadow_params};
    EMA weights are preferred, mirroring the reference's `ema_scope()`
    inference convention (external/magvit2/models/lfqgan.py:63-76).
    """
    import os

    import jax
    import jax.numpy as jnp

    from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel
    from hma_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    tagged = ckpt_dir
    if not os.path.isdir(os.path.join(ckpt_dir, "state")):
        found = latest_checkpoint(ckpt_dir)
        if found is None:
            raise FileNotFoundError(
                f"no orbax checkpoint under '{ckpt_dir}' (expected a "
                "`state/` subdir or step_*/final_checkpt tags)")
        tagged = found
    cfg = None
    for d in (tagged, os.path.dirname(os.path.abspath(tagged))):
        cand = os.path.join(d, "vq_config.json")
        if os.path.exists(cand):
            cfg = VQConfig.from_pretrained(cand)
            break
    if cfg is None:
        cfg = VQConfig()
    model = VQModel(cfg)
    tpl = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    tpl = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tpl)
    tree = load_checkpoint(tagged, {"gen": tpl, "ema": tpl})
    return (tree["ema"] if use_ema else tree["gen"]), cfg


def load_magvit2_checkpoint(ckpt_path: str, use_ema: bool = True) -> dict:
    """Load the reference torch checkpoint file into flax VQModel params.

    Requires torch (CPU) for deserialization only.
    """
    import os

    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(
            f"MagVit2 checkpoint not found at '{ckpt_path}'. Download it from "
            "HF 1x-technologies/worldmodel (magvit2.ckpt) as in the reference "
            "build.sh, then pass --tokenizer_ckpt / --encoder_name_or_path.")
    import torch  # local import: torch is never needed on the TPU path

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                  for k, v in state_dict.items()}
    return torch_state_dict_to_flax(state_dict, use_ema=use_ema)
