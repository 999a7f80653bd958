"""Text-conditioning helpers.

Host-side T5 sentence embeddings (reference: datasets/utils.py:215-248,
whose version referenced an undefined global and was unused). Gated on
transformers + torch(cpu); embeddings are mean-pooled encoder states.
"""

from __future__ import annotations

import numpy as np

_t5 = None


def get_t5_embeddings(texts: list[str], model_name: str = "t5-small",
                      max_length: int = 64) -> np.ndarray:
    """(N,) strings -> (N, d_model) float32 embeddings."""
    global _t5
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    if _t5 is None:
        tok = AutoTokenizer.from_pretrained(model_name)
        enc = T5EncoderModel.from_pretrained(model_name).eval()
        _t5 = (tok, enc)
    tok, enc = _t5
    batch = tok(texts, return_tensors="pt", padding="max_length",
                truncation=True, max_length=max_length)
    with torch.no_grad():
        out = enc(**batch).last_hidden_state  # (N, L, D)
    mask = batch["attention_mask"][..., None].float()
    pooled = (out * mask).sum(1) / mask.sum(1).clamp(min=1)
    return pooled.numpy().astype(np.float32)
