"""Load the reference torch model stack at /root/reference as a parity oracle.

The reference imports two packages absent from this image:

  - `mup`: only `MuReadout`, `set_base_shapes`, and `normal_` are touched
    by `hma/model/st_mask_git.py`. The stub reproduces exactly the
    semantics the reference relies on: `FixedMuReadout.forward` computes
    `nn.Linear.forward(self, output_mult * x / width_mult())`
    (st_mask_git.py:784-789) where, after `set_mup_shapes` against a
    base model of d_model=256 (st_mask_git.py:755-760), a readout's
    width_mult is `in_features / base.in_features`. That ratio is the
    mup package's infshape.width_mult() for this architecture (the only
    varying dim is d_model), so the stub is faithful for these models.
  - `xformers`: `XFORMERS_DISABLED=true` routes every forward through
    `BasicSelfAttention` (hma/model/attention.py:157-161); the stub only
    needs to satisfy the unconditional module-level import.

Reference `STMaskGIT.forward` also calls `.cuda()` on the action-drop
mask (st_mask_git.py:710); on this CPU-only image that call is patched
to a no-op, which is shape/value-neutral.
"""

from __future__ import annotations

import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "hma"))


def _install_mup_stub():
    import torch
    import torch.nn as nn

    if "mup" in sys.modules:
        return
    mup = types.ModuleType("mup")

    class MuReadout(nn.Linear):
        def __init__(self, d_in, d_out, bias=True, readout_zero_init=False,
                     output_mult=1.0, **_):
            super().__init__(d_in, d_out, bias=bias)
            self.output_mult = output_mult
            self._width_mult = 1.0

        def width_mult(self):
            return self._width_mult

    def set_base_shapes(model, base, rescale_params=False, **_):
        for m, b in zip(model.modules(), base.modules()):
            if isinstance(m, MuReadout):
                m._width_mult = m.in_features / b.in_features
        return model

    def normal_(tensor, mean=0.0, std=1.0):
        return torch.nn.init.normal_(tensor, mean=mean, std=std)

    mup.MuReadout = MuReadout
    mup.set_base_shapes = set_base_shapes
    mup.normal_ = normal_
    sys.modules["mup"] = mup


def _install_xformers_stub():
    import torch

    if "xformers" in sys.modules:
        return
    xf = types.ModuleType("xformers")
    ops = types.ModuleType("xformers.ops")
    ops.LowerTriangularMask = object

    def memory_efficient_attention(*a, **k):  # pragma: no cover
        raise RuntimeError("xformers stub: set XFORMERS_DISABLED=true")

    ops.memory_efficient_attention = memory_efficient_attention
    ops.unbind = torch.unbind
    xf.ops = ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = ops


def load_reference_hma():
    """Import and return the reference `hma` model namespace (torch)."""
    os.environ["XFORMERS_DISABLED"] = "true"
    import torch

    _install_mup_stub()
    _install_xformers_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # CPU-only image: make the reference's .cuda() calls no-ops.
    torch.Tensor.cuda = lambda self, *a, **k: self

    from hma.config import DiffusionGenieConfig as TorchDiffusionGenieConfig  # noqa: E402
    from hma.config import GenieConfig as TorchGenieConfig  # noqa: E402
    from hma.model.st_mar import STMAR as TorchSTMAR  # noqa: E402
    from hma.model.st_mask_git import STMaskGIT as TorchSTMaskGIT  # noqa: E402

    return types.SimpleNamespace(
        GenieConfig=TorchGenieConfig,
        DiffusionGenieConfig=TorchDiffusionGenieConfig,
        STMaskGIT=TorchSTMaskGIT,
        STMAR=TorchSTMAR,
    )


def randomize_state_dict(model, seed: int = 0, std: float = 0.05):
    """Fill every parameter with seeded N(0, std) noise in state-dict order.

    Buffers (the ActionStat mean/std tables) are left at their
    config-derived values so normalization stays well-conditioned.
    LayerNorm scales get 1 + noise to stay near identity.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            noise = torch.randn(p.shape, generator=g) * std
            if name.endswith(".weight") and p.dim() == 1:  # LayerNorm scale
                p.copy_(1.0 + noise)
            else:
                p.copy_(noise)
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
