"""Export hma_tpu-trained models to the reference's torch/HF layout.

The mirror of utils/import_torch.py, closing the SURVEY §7.1 checkpoint
contract ("loadable both ways"): a model trained here can be handed to
the reference ecosystem — `STMaskGIT.from_pretrained` consumes a dir of
config.json + pytorch_model.bin with the reference's exact key names
(reference: hma/model/st_mask_git.py:762-769).

Layout conversions (inverse of import_torch.py):
  - Flax Dense kernel (in, out) -> torch Linear weight (out, in);
  - stacked (D, ...) domain tables -> per-domain string-keyed entries in
    `config.action_domains` order, with the zero-padding stripped back
    to each domain's true action width;
  - ActionStat mean/std buffers are regenerated from
    `config.action_stats` (the reference registers them as buffers, so
    a strict `load_state_dict` needs them, st_mask_git.py:131-132);
  - muP needs NO weight transform: both frameworks apply the readout
    multiplier at runtime (torch MuReadout.forward computes
    `W(output_mult * x / width_mult)`, st_mask_git.py:784-789; the Flax
    model multiplies by the equivalent constant `readout_scale`), so
    the weights are interchange-identical and `use_mup` in config.json
    carries the semantics.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict

import numpy as np


def _unlin(sd, name, p):
    """Flax {kernel, bias?} -> torch Linear entries."""
    sd[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"], np.float32).T)
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _unln(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"], np.float32)
    sd[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _unstack_domain_linears(sd, fmt, p, domains, in_dims=None, out_dims=None):
    """(D, in, out)[+ (D, out)] stacks -> per-domain torch Linears,
    slicing away the zero-padding to each domain's true width."""
    K = np.asarray(p["kernel"], np.float32)
    B = np.asarray(p.get("bias"), np.float32) if "bias" in p else None
    for i, d in enumerate(domains):
        w = K[i]
        if in_dims is not None:
            w = w[: in_dims[i]]
        if out_dims is not None:
            w = w[:, : out_dims[i]]
        sd[fmt.format(d) + ".weight"] = np.ascontiguousarray(w.T)
        if B is not None:
            b = B[i]
            if out_dims is not None:
                b = b[: out_dims[i]]
            sd[fmt.format(d) + ".bias"] = b


def _export_trunk(P: dict, config) -> Dict[str, np.ndarray]:
    """Decoder layers + action stems shared by STMaskGIT and STMAR
    (inverse of import_torch._import_trunk)."""
    domains = config.action_domains or []
    d_actions = config.d_actions or []
    sd: Dict[str, np.ndarray] = {}
    sd["action_mask_tokens"] = np.asarray(P["action_mask_tokens"], np.float32)

    for i in range(config.num_layers):
        pref = f"decoder.layers.{i}"
        layer = P["decoder"][f"layers_{i}"]
        for attn in ("spatial_attn", "temporal_attn"):
            a = layer[attn]
            _unlin(sd, f"{pref}.{attn}.qkv", a["qkv"])
            _unlin(sd, f"{pref}.{attn}.proj", a["proj"])
            if "norm" in a:
                _unln(sd, f"{pref}.{attn}.norm", a["norm"])
        _unlin(sd, f"{pref}.mlp.fc1", layer["mlp"]["fc1"])
        _unlin(sd, f"{pref}.mlp.fc2", layer["mlp"]["fc2"])
        if not config.qk_norm:
            _unln(sd, f"{pref}.norm1", layer["norm1"])
            _unln(sd, f"{pref}.norm2", layer["norm2"])
        if domains and "modulate" in config.action_network:
            mod = layer["action_projector"]
            ap = pref + ".action_projectors.{}"
            _unstack_domain_linears(sd, ap + ".adaLN_modulation.0",
                                    mod["ada_fc1"], domains)
            _unstack_domain_linears(sd, ap + ".adaLN_modulation.2",
                                    mod["ada_fc2"], domains)
            _unstack_domain_linears(sd, ap + ".linear_out",
                                    mod["linear_out"], domains)
        elif domains and "cross_attention" in config.action_network:
            proj = layer["action_projector"]
            ap = pref + ".action_projectors.{}"
            for sub in ("to_q", "to_k", "to_v", "proj"):
                _unstack_domain_linears(sd, ap + f".{sub}", proj[sub], domains)
            for i_d, d in enumerate(domains):
                sd[ap.format(d) + ".norm.weight"] = np.asarray(
                    proj["qk_ln_scale"][i_d], np.float32)
                sd[ap.format(d) + ".norm.bias"] = np.asarray(
                    proj["qk_ln_bias"][i_d], np.float32)

    if domains:
        stem = P["action_stem"]
        _unstack_domain_linears(sd, "action_mlp.{}.model.0", stem["fc1"],
                                domains, in_dims=d_actions)
        _unstack_domain_linears(sd, "action_mlp.{}.model.3", stem["fc2"],
                                domains)
        for i, d in enumerate(domains):
            sd[f"action_mlp.{d}.model.1.weight"] = np.asarray(
                stem["ln"]["scale"][i], np.float32)
            sd[f"action_mlp.{d}.model.1.bias"] = np.asarray(
                stem["ln"]["bias"][i], np.float32)
        # ActionStat normalizer buffers, regenerated from the config
        # (the reference saves them in the state dict)
        stats = config.action_stats or [
            [[0.0] * da, [1.0] * da] for da in d_actions]
        for d, st in zip(domains, stats):
            sd[f"action_preprocessor.{d}.mean"] = np.asarray(st[0], np.float32)
            sd[f"action_preprocessor.{d}.std"] = np.asarray(st[1], np.float32)
    return sd


def export_stmaskgit_state_dict(params, config) -> Dict[str, np.ndarray]:
    """hma_tpu STMaskGIT params -> reference torch state dict
    (inverse of import_torch.import_stmaskgit_state_dict)."""
    P = params["params"] if "params" in params else params
    P = _to_numpy_tree(P)
    domains = config.action_domains or []
    sd = _export_trunk(P, config)

    te = P["token_embed"]
    for i in range(config.num_factored_vocabs):
        sd[f"token_embed.factored_embeds.{i}.weight"] = np.asarray(
            te[f"factored_embeds_{i}"]["embedding"], np.float32)
    sd["token_embed.mask_token_embed"] = np.asarray(
        te["mask_token_embed"], np.float32)
    sd["pos_embed_TSC"] = np.asarray(P["pos_embed_TSC"], np.float32)
    _unlin(sd, "out_x_proj", P["out_x_proj"])

    if domains and "action_readout" in P:
        _unstack_domain_linears(sd, "action_out_projectors.{}",
                                P["action_readout"]["out"], domains,
                                out_dims=config.d_actions)
    elif domains:
        # the reference instantiates these projectors unconditionally for
        # the discrete family (st_mask_git.py:234) and only *uses* them
        # under jointly_predict_actions; the Flax model allocates them
        # lazily, so emit zero-filled dead weights for the strict load
        for d, da in zip(domains, config.d_actions):
            sd[f"action_out_projectors.{d}.weight"] = np.zeros(
                (da, config.d_model), np.float32)
            sd[f"action_out_projectors.{d}.bias"] = np.zeros(da, np.float32)
    return sd


def _export_mlp_adaln(sd, pref: str, net: dict, depth: int) -> None:
    """Flax DiffLoss net -> reference SimpleMLPAdaLN entries
    (inverse of import_torch._import_mlp_adaln)."""
    _unlin(sd, f"{pref}.input_proj", net["input_proj"])
    _unlin(sd, f"{pref}.cond_embed", net["cond_embed"])
    _unlin(sd, f"{pref}.time_embed.mlp.0", net["time_embed"]["fc1"])
    _unlin(sd, f"{pref}.time_embed.mlp.2", net["time_embed"]["fc2"])
    _unlin(sd, f"{pref}.final_layer.adaLN_modulation.1", net["final_adaLN"])
    _unlin(sd, f"{pref}.final_layer.linear", net["final_linear"])
    for i in range(depth):
        b = f"{pref}.res_blocks.{i}"
        _unln(sd, f"{b}.in_ln", net[f"res_{i}_ln"])
        _unlin(sd, f"{b}.adaLN_modulation.1", net[f"res_{i}_adaLN"])
        _unlin(sd, f"{b}.mlp.0", net[f"res_{i}_fc1"])
        _unlin(sd, f"{b}.mlp.2", net[f"res_{i}_fc2"])


def _export_action_mlp_adaln(sd, fmt: str, net: dict, depth: int,
                             domains, d_actions, max_da: int) -> None:
    """Domain-stacked action DiffLoss -> per-domain reference nets
    (inverse of import_torch._import_action_mlp_adaln)."""
    _unstack_domain_linears(sd, fmt + ".input_proj", net["input_proj"],
                            domains, in_dims=d_actions)
    _unstack_domain_linears(sd, fmt + ".cond_embed", net["cond_embed"], domains)
    _unstack_domain_linears(sd, fmt + ".time_embed.mlp.0", net["time_fc1"],
                            domains)
    _unstack_domain_linears(sd, fmt + ".time_embed.mlp.2", net["time_fc2"],
                            domains)
    _unstack_domain_linears(sd, fmt + ".final_layer.adaLN_modulation.1",
                            net["final_adaLN"], domains)
    # final_linear out is [eps(max_da) | v(max_da)]; re-pack to the
    # domain's true [eps(da) | v(da)]
    K = np.asarray(net["final_linear"]["kernel"], np.float32)
    B = np.asarray(net["final_linear"]["bias"], np.float32)
    for i, (d, da) in enumerate(zip(domains, d_actions)):
        w = np.concatenate([K[i][:, :da], K[i][:, max_da:max_da + da]], axis=1)
        b = np.concatenate([B[i][:da], B[i][max_da:max_da + da]])
        sd[fmt.format(d) + ".final_layer.linear.weight"] = \
            np.ascontiguousarray(w.T)
        sd[fmt.format(d) + ".final_layer.linear.bias"] = b
    for k in range(depth):
        blk = f"res_blocks.{k}"
        ln = net[f"res_{k}_ln"]
        for i, d in enumerate(domains):
            sd[fmt.format(d) + f".{blk}.in_ln.weight"] = np.asarray(
                ln["scale"][i], np.float32)
            sd[fmt.format(d) + f".{blk}.in_ln.bias"] = np.asarray(
                ln["bias"][i], np.float32)
        _unstack_domain_linears(sd, fmt + f".{blk}.adaLN_modulation.1",
                                net[f"res_{k}_adaLN"], domains)
        _unstack_domain_linears(sd, fmt + f".{blk}.mlp.0",
                                net[f"res_{k}_fc1"], domains)
        _unstack_domain_linears(sd, fmt + f".{blk}.mlp.2",
                                net[f"res_{k}_fc2"], domains)


def export_stmar_state_dict(params, config) -> Dict[str, np.ndarray]:
    """hma_tpu STMAR params -> reference torch state dict
    (inverse of import_torch.import_stmar_state_dict).

    pos_embed_TSC is re-padded to the full S columns the reference
    allocates (it reads only the first seq_len + action_token_size,
    st_mar.py:180; the pad is zeros)."""
    P = params["params"] if "params" in params else params
    P = _to_numpy_tree(P)
    domains = config.action_domains or []
    sd = _export_trunk(P, config)

    pe = np.asarray(P["pos_embed_TSC"], np.float32)
    full = config.S + config.action_token_size
    if pe.shape[2] < full:
        pe = np.pad(pe, ((0, 0), (0, 0), (0, full - pe.shape[2]), (0, 0)))
    sd["pos_embed_TSC"] = pe
    sd["diffusion_pos_embed_learned"] = np.asarray(
        P["diffusion_pos_embed_learned"], np.float32)
    sd["mask_token"] = np.asarray(P["mask_token"], np.float32)
    sd["token_embed.weight"] = np.ascontiguousarray(
        np.asarray(P["token_embed"]["kernel"], np.float32).T)
    _unlin(sd, "out_x_proj", P["out_x_proj"])
    _unln(sd, "decoder_norm", P["decoder_norm"])
    _unln(sd, "z_proj_ln", P["z_proj_ln"])
    _export_mlp_adaln(sd, "diffloss.net", P["diffloss"]["net"],
                      config.diffloss_d)
    if domains and "action_diff_loss" in P:
        _export_action_mlp_adaln(sd, "action_diff_losses.{}.net",
                                 P["action_diff_loss"]["net"],
                                 config.diffloss_d, domains,
                                 config.d_actions, config.max_d_action)
    return sd


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


def save_reference_checkpoint(out_dir: str, params, config,
                              use_safetensors: bool = False) -> str:
    """Write `out_dir/{config.json, pytorch_model.bin|model.safetensors}`
    in the reference's HF layout. Family (STMaskGIT vs STMAR) is
    dispatched by the config type, mirroring the importer's state-dict
    dispatch."""
    from hma_tpu.config import DiffusionGenieConfig

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(config, DiffusionGenieConfig):
        sd = export_stmar_state_dict(params, config)
    else:
        sd = export_stmaskgit_state_dict(params, config)

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f)

    if use_safetensors:
        from safetensors.numpy import save_file

        path = os.path.join(out_dir, "model.safetensors")
        save_file(sd, path)
    else:
        import torch

        path = os.path.join(out_dir, "pytorch_model.bin")
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
    return path
