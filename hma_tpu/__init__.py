"""HMA-TPU: a TPU-native framework for Heterogeneous Masked Autoregression.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of liruiw/HMA
(arXiv 2502.04296): robotic video world models over heterogeneous
embodiments, with a spatiotemporal masked transformer trunk, discrete
(MaskGIT, factored-vocab cross-entropy) and continuous (MAR, per-token
diffusion) heads, MagVit2-LFQ / SVD-VAE tokenizers, and an interactive
simulator.

Design notes (TPU-first, not a port):
  - All compute paths are jit-compiled with static shapes; MaskGIT
    sampling is a lax loop with masked writes, not boolean indexing.
  - Heterogeneous embodiments are integer domain ids indexing stacked
    parameter tables (one compiled program serves every domain), not
    string-keyed module dicts (reference: hma/model/st_mask_git.py:215).
  - Autoregressive rollout uses a temporal KV cache: the reference
    recomputes the full T-frame stack per MaskGIT step
    (hma/generate.py:157, hma/model/st_mask_git.py:382); we compute a
    single frame per step.
  - Scaling is jax.sharding over a Mesh (dp/fsdp/tp axes) with XLA
    collectives, replacing torch DDP/NCCL (hma/train_multi.py:779).
"""

__version__ = "0.1.0"
