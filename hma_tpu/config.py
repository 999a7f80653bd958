"""Model configuration dataclasses with JSON (de)serialization.

Field names and defaults mirror the reference model cards
(reference: hma/config.py:9-118 and hma/configs/*.json) so that config
JSON files are interchangeable between the two frameworks. Extra
TPU-specific knobs (dtype, sharding) are kept out of the JSON surface.
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass
from typing import List, Optional


def nth_root(x: int, n: int) -> int:
    """Integer n-th root with exactness check (reference: hma/model/factorization_utils.py:99)."""
    root = round(x ** (1 / n))
    assert root**n == x, (x, n, root)
    return root


@dataclass
class GenieConfig:
    """Configuration for the discrete STMaskGIT model (reference: hma/config.py:9)."""

    num_layers: int
    num_heads: int
    d_model: int
    T: int = 12  # temporal sequence length
    S: int = 256  # spatial sequence length, e.g. 256 for 16x16
    image_vocab_size: int = 262144  # number of distinct image tokens (2**18)
    use_mup: bool = False
    dataloader_apply_mask: bool = True
    dataloader_apply_corruption: bool = True
    dataloader_mask_ratio_min: float = 0.2
    drop_action_ratio: float = 0.0
    arch: str = "STTransformerDecoder"
    random_dummy_action: bool = True

    # Factorization for large vocabs (e.g. Open-MAGVIT2): 2**18 -> 2 x 512
    num_factored_vocabs: int = 1
    factored_vocab_size: Optional[int] = None

    # MaskGIT training
    max_corrupt_rate: float = 0.2
    non_mlm_ratio: float = 0.2
    num_prompt_frames: int = 4

    # Action conditioning
    init_actions: bool = False
    d_action: int = 28
    use_actions: bool = True
    action_domains: Optional[List[str]] = None
    d_actions: Optional[List[int]] = None
    action_stats: Optional[list] = None  # per-domain [mean, std] lists
    action_network: str = "mlp"
    # "fixed" (default): correct per-head cross-attention for the
    # "cross_attention" action network. "reference": bit-faithful
    # emulation of the reference BasicCrossAttention quirk — no head
    # transpose, so attention runs ACROSS the head axis and the output
    # reshape scrambles (head, time) (hma/model/attention.py:111-132) —
    # required to import checkpoints trained with that mode. The quirk
    # mixes timesteps, so only full-forward paths support it (training,
    # compute_logits, full-recompute generation); the KV-cached frame
    # paths refuse it.
    cross_attention_compat: str = "fixed"
    shared_action_mlps: bool = True
    action_contrastive_loss: bool = False
    jointly_predict_actions: bool = False
    jointly_predict_states: bool = True
    action_token_size: int = 64
    label_drop_prob: float = 0.5
    action_loss_weight: float = 0.5

    # Attention
    qkv_bias: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    qk_norm: bool = True

    # MLP
    mlp_ratio: float = 4.0
    mlp_drop: float = 0.0
    mlp_bias: bool = True

    def __post_init__(self):
        if self.image_vocab_size is None:
            self.factored_vocab_size = 64  # dummy, matching reference behavior
        else:
            self.factored_vocab_size = nth_root(self.image_vocab_size, self.num_factored_vocabs)

    # -- JSON surface (interchangeable with the reference's model cards) --
    def save_pretrained(self, json_path: str) -> None:
        with open(json_path, "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def from_pretrained(cls, json_path: str) -> "GenieConfig":
        with open(json_path) as f:
            raw = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in names})

    def shallow_copy(self):
        return dataclasses.replace(self)

    # -- Derived quantities --
    @property
    def h(self) -> int:
        side = math.isqrt(self.S)
        assert side * side == self.S, "Expected S to be square"
        return side

    @property
    def w(self) -> int:
        return self.h

    @property
    def mask_token_id(self) -> int:
        return self.image_vocab_size

    @property
    def num_domains(self) -> int:
        return len(self.action_domains) if self.action_domains else 0

    @property
    def max_d_action(self) -> int:
        """All per-domain action vectors are zero-padded to this width."""
        if not self.d_actions:
            return self.d_action
        return max(self.d_actions)


@dataclass
class DiffusionGenieConfig(GenieConfig):
    """Configuration for the continuous STMAR model (reference: hma/config.py:85)."""

    Diffusion: bool = True

    dim: int = 512
    dataloader_apply_mask: bool = True
    dataloader_apply_corruption: bool = False
    dataloader_mask_ratio_min: float = 0.1

    vae_stride: int = 1
    patch_size: int = 1
    vae_embed_dim: int = 4
    mask_ratio_min: float = 0.7
    attn_dropout: float = 0.1
    proj_dropout: float = 0.1
    buffer_size: int = 64
    diffloss_d: int = 4
    diffloss_w: int = 1024
    num_sampling_steps: str = "100"
    diffusion_batch_mul: int = 1
    grad_checkpointing: bool = False
    label_drop_prob: float = 0.5
    action_loss_weight: float = 1.0
    predict_unmask: bool = False
    maskgit_steps: int = 16
    # "mar" (default): MAR-paper rollout — each patch sampled exactly
    # once, when first revealed. "reference": bit-faithful emulation of
    # the reference loop's selection semantics, which re-samples every
    # still-scheduled position each step because its `unmasked` state is
    # never updated (st_mar.py:376-411) — needed to isolate sampling-
    # distribution fidelity when loading reference-trained weights.
    # See rollout/mar.py mar_subset_schedule.
    mar_sampling_compat: str = "mar"

    def shallow_copy(self):
        return dataclasses.replace(self)


@dataclass
class CogVideoGenieConfig(GenieConfig):
    """Unused CogVideo variant kept for config-surface parity
    (reference: hma/config.py:120-133; never instantiated there either)."""

    CogVideo: bool = True
    dim: int = 512
    num_attention_heads: int = 30
    attention_head_dim: int = 16
    time_embed_dim: int = 128


def load_config(path: str):
    """Load either config flavor from a JSON file; dispatch on the `Diffusion` key."""
    with open(path) as f:
        raw = json.load(f)
    cls = DiffusionGenieConfig if raw.get("Diffusion", False) else GenieConfig
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in raw.items() if k in names})
