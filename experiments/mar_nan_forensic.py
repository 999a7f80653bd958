"""Forensics on the saved d512 STMAR blowup state (mar_nan_probe dump).

The per-term localization (experiments/artifacts/mar_nan_r5.json) showed:
the IMAGE diffusion loss backward is non-finite for trunk layers <= 26
(kernels AND the active domain's 1/8 slice of the stacked action tables)
while layer-26 *bias* grads stay clean — the signature of a forward
activation blow-up: bias grads only sum the (finite) cotangent, kernel
grads contract it against the (huge) forward activation. This script
confirms by scanning per-layer residual-stream magnitudes in the saved
state, per timestep row — no retraining.

Run (chip): python experiments/mar_nan_forensic.py [--dump /tmp/mar_nan_state.npz]
Writes experiments/artifacts/mar_nan_forensic_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/mar_nan_state.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR

    z = np.load(args.dump)
    bad_step = int(z["__bad_step__"])
    params = unflatten({k: z[k] for k in z.files if k != "__bad_step__"})

    cfg = _config(8)
    model = STMAR(cfg, remat=False)
    B = 8
    lat, mask0, actions, dom = _data(cfg, B)

    # mirror the probe's bad-step collate exactly (PRNGKey(bad_step))
    key = jax.random.PRNGKey(bad_step)
    k_mask, k_step = jax.random.split(key)
    mmin = cfg.dataloader_mask_ratio_min
    n_tail = cfg.T - 1
    u = jax.random.uniform(k_mask, (B, n_tail, 1, 1))
    prob = jnp.cos((u * (1.0 - mmin) + mmin) * jnp.pi / 2)
    r = jax.random.uniform(jax.random.fold_in(k_mask, 1),
                           (B, n_tail, cfg.h, cfg.h))
    tail = (r < prob).astype(jnp.int32)
    indicator = jnp.concatenate(
        [jnp.zeros((B, 1, cfg.h, cfg.h), jnp.int32), tail], axis=1)
    rngs = {"dropout": jax.random.fold_in(k_step, 1),
            "action_drop": jax.random.fold_in(k_step, 2),
            "diffusion": k_step}

    # capture every STBlock output (the residual stream between layers)
    def keep(mdl, _method):
        return type(mdl).__name__ in ("STBlock", "STTransformerDecoder")

    @jax.jit
    def fwd(p):
        out, inter = model.apply(
            p, lat, lat, actions, dom, indicator, deterministic=False,
            rngs=rngs, capture_intermediates=keep)
        stats = {}
        flat = jax.tree_util.tree_leaves_with_path(inter["intermediates"])
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            leaf = leaf.astype(jnp.float32)
            stats[name] = (jnp.max(jnp.abs(leaf)),
                           jnp.sqrt(jnp.mean(leaf * leaf)),
                           jnp.sum(~jnp.isfinite(leaf)))
        return out["loss"], stats

    loss, stats = fwd(params)
    rec = {"probe": "mar_nan_forensic", "bad_step": bad_step,
           "loss": float(loss), "layers": {}}
    for name, (mx, rms, nonfin) in sorted(stats.items()):
        rec["layers"][name] = {"max_abs": float(mx), "rms": float(rms),
                               "nonfinite": int(nonfin)}
        print(f"{name}: max|x|={float(mx):.3e} rms={float(rms):.3e} "
              f"nonfinite={int(nonfin)}", flush=True)

    # image-term gradient magnitude profile: the probe showed clean
    # grads for layers >= 27 and NaN below; if max|g| grows ~10x per
    # layer from 31 down to 27 the backward is exploding multiplicatively
    # (AdaLN gates / weight growth) and crosses inf at 26 — vs a flat
    # profile, which would mean a point-source op inside layer 26.
    def loss_img(p):
        out = model.apply(p, lat, lat, actions, dom, indicator,
                          deterministic=False, rngs=rngs)
        return out["loss"]

    @jax.jit
    def grad_profile(p):
        g = jax.grad(loss_img)(p)
        leaves = jax.tree_util.tree_leaves(g)
        mx = jnp.stack([jnp.max(jnp.where(jnp.isfinite(l), jnp.abs(l), 0.0)
                                .astype(jnp.float32)) for l in leaves])
        bad = jnp.stack([jnp.sum(~jnp.isfinite(l.astype(jnp.float32)))
                         for l in leaves])
        return mx, bad

    mx_v, bad_v = grad_profile(params)
    mx_v, bad_v = np.asarray(mx_v), np.asarray(bad_v)
    names = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in jax.tree_util.tree_leaves_with_path(
                 jax.eval_shape(lambda p: p, params))]
    rec["grad_profile"] = [
        {"leaf": n, "max_finite": float(m), "nonfinite": int(b)}
        for n, m, b in zip(names, mx_v, bad_v)]
    import re as _re
    per_layer: dict = {}
    for n, m, b in zip(names, mx_v, bad_v):
        mm = _re.search(r"layers_(\d+)", n)
        k = int(mm.group(1)) if mm else -1
        cur = per_layer.setdefault(k, [0.0, 0])
        cur[0] = max(cur[0], float(m))
        cur[1] += int(b)
    for k in sorted(per_layer):
        mxl, badl = per_layer[k]
        print(f"layer {k}: max|g|={mxl:.3e} nonfinite={badl}", flush=True)
    rec["grad_per_layer"] = {str(k): {"max_finite": v[0], "nonfinite": v[1]}
                             for k, v in per_layer.items()}

    # per-param-leaf magnitude scan: which weights exploded?
    big = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        a = np.abs(np.asarray(leaf, np.float32))
        big.append((float(a.max()), float(np.sqrt((a * a).mean())), name))
    big.sort(reverse=True)
    rec["largest_params"] = [
        {"leaf": n, "max_abs": m, "rms": r} for m, r, n in big[:25]]
    for m, r, n in big[:15]:
        print(f"param {n}: max|w|={m:.3e} rms={r:.3e}", flush=True)

    out_p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "mar_nan_forensic_r5.json")
    with open(out_p, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
