"""Import reference (torch) HMA checkpoints into hma_tpu params.

Maps the reference STMaskGIT state dict (hma/model/st_mask_git.py, saved
via HF save_pretrained as pytorch_model.bin / model.safetensors) onto the
Flax STMaskGIT parameter tree, including the string-keyed per-domain
ModuleDicts -> stacked domain tables translation. muP checkpoints fold
their readout multipliers at import (the Flax model applies
readout_scale as a constant; see st_mask_git.py readout_scale).

Layout conversions: torch Linear weight (out, in) -> kernel (in, out);
Embedding stays (vocab, d). Per-domain modules stack in
`config.action_domains` order; action widths zero-pad to max_d_action.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(sd, name):
    """torch Linear -> {kernel, bias?}."""
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T.astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"]).astype(np.float32)
    return out


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]).astype(np.float32),
            "bias": np.asarray(sd[f"{name}.bias"]).astype(np.float32)}


def _stack_domain_linears(sd, fmt, domains, in_pad=None, out_pad=None):
    """Stack per-domain torch Linears into (D, in, out) + (D, out) tables."""
    kernels, biases = [], []
    for d in domains:
        w = np.asarray(sd[fmt.format(d) + ".weight"]).T.astype(np.float32)
        if in_pad and w.shape[0] < in_pad:
            w = np.pad(w, ((0, in_pad - w.shape[0]), (0, 0)))
        if out_pad and w.shape[1] < out_pad:
            w = np.pad(w, ((0, 0), (0, out_pad - w.shape[1])))
        kernels.append(w)
        bname = fmt.format(d) + ".bias"
        if bname in sd:
            b = np.asarray(sd[bname]).astype(np.float32)
            if out_pad and b.shape[0] < out_pad:
                b = np.pad(b, (0, out_pad - b.shape[0]))
            biases.append(b)
    out = {"kernel": np.stack(kernels)}
    if biases:
        out["bias"] = np.stack(biases)
    return out


def _import_trunk(sd, config) -> dict:
    """Decoder layers + action stems shared by STMaskGIT and STMAR."""
    domains = config.action_domains or []
    P: dict = {}
    P["action_mask_tokens"] = sd["action_mask_tokens"].astype(np.float32)

    dec = {}
    for i in range(config.num_layers):
        pref = f"decoder.layers.{i}"
        layer = {}
        for attn in ("spatial_attn", "temporal_attn"):
            a = {"qkv": _lin(sd, f"{pref}.{attn}.qkv"),
                 "proj": _lin(sd, f"{pref}.{attn}.proj")}
            if f"{pref}.{attn}.norm.weight" in sd:
                a["norm"] = _ln(sd, f"{pref}.{attn}.norm")
            layer[attn] = a
        layer["mlp"] = {"fc1": _lin(sd, f"{pref}.mlp.fc1"),
                        "fc2": _lin(sd, f"{pref}.mlp.fc2")}
        if not config.qk_norm:
            layer["norm1"] = _ln(sd, f"{pref}.norm1")
            layer["norm2"] = _ln(sd, f"{pref}.norm2")
        # per-layer per-domain projectors -> stacked DomainModulate
        if domains and "modulate" in config.action_network:
            mod = {
                "ada_fc1": _stack_domain_linears(
                    sd, pref + ".action_projectors.{}.adaLN_modulation.0", domains),
                "ada_fc2": _stack_domain_linears(
                    sd, pref + ".action_projectors.{}.adaLN_modulation.2", domains),
                "linear_out": _stack_domain_linears(
                    sd, pref + ".action_projectors.{}.linear_out", domains),
            }
            layer["action_projector"] = mod
        elif domains and "cross_attention" in config.action_network:
            # per-domain BasicCrossAttention (st_transformer.py:103) ->
            # stacked DomainCrossAttention; its qk-LN is always present
            # (BasicCrossAttention defaults qk_norm=True regardless of
            # the trunk config, attention.py:73,93)
            ap = pref + ".action_projectors.{}"
            proj = {
                "to_q": _stack_domain_linears(sd, ap + ".to_q", domains),
                "to_k": _stack_domain_linears(sd, ap + ".to_k", domains),
                "to_v": _stack_domain_linears(sd, ap + ".to_v", domains),
                "proj": _stack_domain_linears(sd, ap + ".proj", domains),
                "qk_ln_scale": np.stack([
                    np.asarray(sd[ap.format(d) + ".norm.weight"]).astype(np.float32)
                    for d in domains]),
                "qk_ln_bias": np.stack([
                    np.asarray(sd[ap.format(d) + ".norm.bias"]).astype(np.float32)
                    for d in domains]),
            }
            layer["action_projector"] = proj
        dec[f"layers_{i}"] = layer
    P["decoder"] = dec

    # action stems (BasicMLP: model.0 Linear, model.1 LN, model.3 Linear)
    if domains:
        max_da = config.max_d_action
        stem = {
            "fc1": _stack_domain_linears(sd, "action_mlp.{}.model.0", domains,
                                         in_pad=max_da),
            "fc2": _stack_domain_linears(sd, "action_mlp.{}.model.3", domains),
            "ln": {
                "scale": np.stack([
                    np.asarray(sd[f"action_mlp.{d}.model.1.weight"]).astype(np.float32)
                    for d in domains]),
                "bias": np.stack([
                    np.asarray(sd[f"action_mlp.{d}.model.1.bias"]).astype(np.float32)
                    for d in domains]),
            },
        }
        P["action_stem"] = stem
    return P


def import_stmaskgit_state_dict(sd: Dict[str, np.ndarray], config) -> dict:
    """Reference STMaskGIT state dict -> {'params': ...} for hma_tpu.

    `config` must already carry the dataset-derived fields
    (action_domains/d_actions/action_stats) the checkpoint was trained
    with — the reference stores them in its config.json.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    domains = config.action_domains or []
    P = _import_trunk(sd, config)

    # embeddings and globals
    te = {}
    for i in range(config.num_factored_vocabs):
        te[f"factored_embeds_{i}"] = {
            "embedding": sd[f"token_embed.factored_embeds.{i}.weight"].astype(np.float32)}
    te["mask_token_embed"] = sd["token_embed.mask_token_embed"].astype(np.float32)
    P["token_embed"] = te
    P["pos_embed_TSC"] = sd["pos_embed_TSC"].astype(np.float32)
    P["out_x_proj"] = _lin(sd, "out_x_proj")

    if domains and config.jointly_predict_actions and \
            f"action_out_projectors.{domains[0]}.weight" in sd:
        P["action_readout"] = {"out": _stack_domain_linears(
            sd, "action_out_projectors.{}", domains, out_pad=config.max_d_action)}

    return {"params": P}


def _import_mlp_adaln(sd, pref: str, depth: int) -> dict:
    """Reference SimpleMLPAdaLN (diffloss.py:151-233) -> Flax net params."""
    net = {
        "input_proj": _lin(sd, f"{pref}.input_proj"),
        "cond_embed": _lin(sd, f"{pref}.cond_embed"),
        "time_embed": {"fc1": _lin(sd, f"{pref}.time_embed.mlp.0"),
                       "fc2": _lin(sd, f"{pref}.time_embed.mlp.2")},
        "final_adaLN": _lin(sd, f"{pref}.final_layer.adaLN_modulation.1"),
        "final_linear": _lin(sd, f"{pref}.final_layer.linear"),
    }
    for i in range(depth):
        b = f"{pref}.res_blocks.{i}"
        net[f"res_{i}_ln"] = _ln(sd, f"{b}.in_ln")
        net[f"res_{i}_adaLN"] = _lin(sd, f"{b}.adaLN_modulation.1")
        net[f"res_{i}_fc1"] = _lin(sd, f"{b}.mlp.0")
        net[f"res_{i}_fc2"] = _lin(sd, f"{b}.mlp.2")
    return net


def _import_action_mlp_adaln(sd, fmt: str, depth: int, domains, d_actions,
                             max_da: int) -> dict:
    """Per-domain reference DiffLoss nets -> one domain-stacked net.

    fmt e.g. "action_diff_losses.{}.net". Channel padding: input_proj
    pads its in-dim to max_da; final_linear's (eps | v) output halves pad
    independently so the padded layout stays [eps(max) | v(max)]
    (reference: diffloss.py:19 out_channels = target * 2).
    """
    def stack_lin(sub):
        return _stack_domain_linears(sd, fmt + "." + sub, domains)

    def stack_ln(sub):
        return {"scale": np.stack([
                    np.asarray(sd[fmt.format(d) + "." + sub + ".weight"]).astype(np.float32)
                    for d in domains]),
                "bias": np.stack([
                    np.asarray(sd[fmt.format(d) + "." + sub + ".bias"]).astype(np.float32)
                    for d in domains])}

    net = {
        "input_proj": _stack_domain_linears(sd, fmt + ".input_proj", domains,
                                            in_pad=max_da),
        "cond_embed": stack_lin("cond_embed"),
        "time_fc1": stack_lin("time_embed.mlp.0"),
        "time_fc2": stack_lin("time_embed.mlp.2"),
        "final_adaLN": stack_lin("final_layer.adaLN_modulation.1"),
    }
    # final_linear: pad each (eps, v) half of the out dim to max_da
    kernels, biases = [], []
    for d, da in zip(domains, d_actions):
        w = np.asarray(sd[fmt.format(d) + ".final_layer.linear.weight"]).T.astype(np.float32)
        b = np.asarray(sd[fmt.format(d) + ".final_layer.linear.bias"]).astype(np.float32)
        pad = ((0, 0), (0, max_da - da))
        kernels.append(np.concatenate(
            [np.pad(w[:, :da], pad), np.pad(w[:, da:], pad)], axis=1))
        biases.append(np.concatenate(
            [np.pad(b[:da], pad[1]), np.pad(b[da:], pad[1])]))
    net["final_linear"] = {"kernel": np.stack(kernels), "bias": np.stack(biases)}
    for i in range(depth):
        b = f"res_blocks.{i}"
        net[f"res_{i}_ln"] = stack_ln(f"{b}.in_ln")
        net[f"res_{i}_adaLN"] = stack_lin(f"{b}.adaLN_modulation.1")
        net[f"res_{i}_fc1"] = stack_lin(f"{b}.mlp.0")
        net[f"res_{i}_fc2"] = stack_lin(f"{b}.mlp.2")
    return net


def import_stmar_state_dict(sd: Dict[str, np.ndarray], config) -> dict:
    """Reference STMAR state dict -> {'params': ...} for hma_tpu.STMAR.

    Maps the continuous model's extra groups (reference:
    hma/model/st_mar.py:37-120, diffloss.py:10-59): latent mask token,
    linear patch embed, z_proj_ln/decoder_norm, diffusion pos embed, the
    DiffLoss MLP, and per-domain action diffusion heads -> one
    domain-stacked head. pos_embed_TSC is sliced to the patch grid
    (the reference allocates it at full S but reads only the first
    seq_len + action_token_size columns, st_mar.py:180).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    domains = config.action_domains or []
    P = _import_trunk(sd, config)

    seq_len = config.S // config.patch_size**2
    s_tot = seq_len + config.action_token_size
    P["pos_embed_TSC"] = sd["pos_embed_TSC"][:, :, :s_tot].astype(np.float32)
    P["diffusion_pos_embed_learned"] = \
        sd["diffusion_pos_embed_learned"].astype(np.float32)
    P["mask_token"] = sd["mask_token"].astype(np.float32)
    P["token_embed"] = {"kernel": sd["token_embed.weight"].T.astype(np.float32)}
    P["out_x_proj"] = _lin(sd, "out_x_proj")
    P["decoder_norm"] = _ln(sd, "decoder_norm")
    P["z_proj_ln"] = _ln(sd, "z_proj_ln")
    P["diffloss"] = {"net": _import_mlp_adaln(sd, "diffloss.net",
                                              config.diffloss_d)}

    if domains and f"action_diff_losses.{domains[0]}.net.input_proj.weight" in sd:
        P["action_diff_loss"] = {"net": _import_action_mlp_adaln(
            sd, "action_diff_losses.{}.net", config.diffloss_d,
            domains, config.d_actions, config.max_d_action)}

    return {"params": P}


def load_reference_checkpoint(path: str, config) -> dict:
    """Load a reference checkpoint dir/file (pytorch_model.bin or
    model.safetensors) into Flax params. Dispatches STMaskGIT vs STMAR
    by the state dict itself: STMAR's patch embed is a Linear
    (`token_embed.weight`), the discrete model's a FactorizedEmbedding
    (`token_embed.factored_embeds.*`, reference st_mar.py:57 vs
    st_mask_git.py:184)."""
    import os

    sd = None
    if os.path.isdir(path):
        for cand in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu", weights_only=True).items()}
    if "token_embed.weight" in sd:
        return import_stmar_state_dict(sd, config)
    return import_stmaskgit_state_dict(sd, config)
