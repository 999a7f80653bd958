"""Flax->torch checkpoint export: the mirror of test_model_parity.py.

SURVEY §7.1 requires the checkpoint contract be loadable BOTH ways. These
tests prove an hma_tpu-trained model can be handed back to the reference:
the exported state dict loads into the actual reference torch model with
`strict=True` (so every key and shape matches what
`STMaskGIT.from_pretrained` would consume, st_mask_git.py:762-769), and
the reloaded torch model reproduces the Flax logits elementwise.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_oracle import (  # noqa: E402
    load_reference_hma,
    randomize_state_dict,
    reference_available,
)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree unavailable")


def _roundtrip_check(sd, sd2, value_ignore=()):
    """Exported dict must cover the torch state dict exactly.

    value_ignore: keys that must exist but whose values need not match
    (dead weights the reference allocates but never uses — the exporter
    zero-fills them)."""
    missing = set(sd) - set(sd2)
    extra = set(sd2) - set(sd)
    assert not missing, f"export missing keys: {sorted(missing)[:5]}"
    assert not extra, f"export extra keys: {sorted(extra)[:5]}"
    for k in sd:
        if any(k.startswith(p) for p in value_ignore):
            continue
        np.testing.assert_allclose(
            np.asarray(sd2[k]), np.asarray(sd[k]), rtol=0, atol=1e-6,
            err_msg=k)


# ------------------------------------------------------------- STMaskGIT


@pytest.mark.parametrize("overrides", [
    dict(),  # concat+modulate, the production card configuration
    dict(action_network="cross_attention",
         cross_attention_compat="reference"),
    dict(jointly_predict_actions=True),
    dict(use_mup=True, qk_norm=True),
])
def test_stmaskgit_export_roundtrip_and_torch_load(overrides):
    import torch

    from tests.test_model_parity import _build_pair, _inputs, _torch_logits
    from hma_tpu.utils.export_torch import export_stmaskgit_state_dict

    tmodel, jmodel, params, jcfg = _build_pair(seed=3, **overrides)
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}

    sd2 = export_stmaskgit_state_dict(params, jcfg)
    ignore = (() if jcfg.jointly_predict_actions
              else ("action_out_projectors.",))
    _roundtrip_check(sd, sd2, value_ignore=ignore)

    # the reference model consumes the export with strict=True ...
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd2.items()}, strict=True)
    tmodel.eval()

    # ... and reproduces the Flax logits elementwise
    from tests.test_model_parity import _flax_logits

    tokens, labels, actions, actions_padded = _inputs(jcfg, seed=5, domain=0)
    tl, _ = _torch_logits(tmodel, tokens, actions, "alpha")
    jl, _ = _flax_logits(jmodel, params, jcfg, tokens, actions_padded, 0)
    np.testing.assert_allclose(jl, tl, rtol=1e-4, atol=2e-4)


def test_save_reference_checkpoint_layout(tmp_path):
    """save_reference_checkpoint writes the HF dir layout the reference's
    from_pretrained discovery expects (config.json + pytorch_model.bin),
    and import_torch round-trips it."""
    import torch

    from tests.test_model_parity import _build_pair
    from hma_tpu.utils.export_torch import save_reference_checkpoint
    from hma_tpu.utils.import_torch import load_reference_checkpoint

    tmodel, jmodel, params, jcfg = _build_pair(seed=4)
    out = tmp_path / "export"
    path = save_reference_checkpoint(str(out), params, jcfg)
    assert (out / "config.json").is_file()
    assert (out / "pytorch_model.bin").is_file()

    sd = torch.load(path, map_location="cpu", weights_only=True)
    tmodel.load_state_dict(sd, strict=True)

    # full circle: the written file re-imports to the identical tree
    params2 = load_reference_checkpoint(str(out), jcfg)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ----------------------------------------------------------------- STMAR


def test_stmar_export_roundtrip_and_torch_load():
    import torch

    from tests.test_stmar_parity import _build_pair
    from hma_tpu.utils.export_torch import export_stmar_state_dict

    tmodel, jmodel, params, jcfg = _build_pair(seed=6)
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}

    sd2 = export_stmar_state_dict(params, jcfg)
    # pos_embed_TSC: the reference allocates full S + action_token_size
    # columns but only the first seq_len + action_token_size are read
    # (st_mar.py:180) — the importer slices, the exporter zero-pads, so
    # compare only the live columns and the shape.
    assert sd2["pos_embed_TSC"].shape == sd["pos_embed_TSC"].shape
    seq_len = jcfg.S // jcfg.patch_size**2
    live = seq_len + jcfg.action_token_size
    np.testing.assert_allclose(sd2["pos_embed_TSC"][:, :, :live],
                               sd["pos_embed_TSC"][:, :, :live], atol=1e-6)
    rest = {k for k in sd if k != "pos_embed_TSC"}
    _roundtrip_check({k: sd[k] for k in rest},
                     {k: v for k, v in sd2.items() if k != "pos_embed_TSC"})

    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd2.items()}, strict=True)


def test_stmar_export_with_action_heads():
    import torch

    from tests.test_stmar_parity import _build_pair
    from hma_tpu.utils.export_torch import export_stmar_state_dict

    tmodel, jmodel, params, jcfg = _build_pair(
        seed=7, jointly_predict_actions=True)
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    sd2 = export_stmar_state_dict(params, jcfg)
    assert set(sd) == set(sd2)
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd2.items()}, strict=True)
    # the padded action-diffusion final_linear unfolds to the true widths
    for d, da in zip(jcfg.action_domains, jcfg.d_actions):
        k = f"action_diff_losses.{d}.net.final_layer.linear.weight"
        assert sd2[k].shape == sd[k].shape == (2 * da, sd[k].shape[1])
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-6)
