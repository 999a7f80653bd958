"""Headline benchmark: both HMA flagships on one chip, one JSON line.

Measures, in allocator-clean sections:
  1. 362M discrete (d256 card, 40 domains) training step — the exact
     production stack (remat, Pallas attention kernels, domain-sliced
     AdamW, donation);
  2. an overfit-one-batch convergence check continuing from (1): the
     on-chip counterpart of the reference's `--overfit_first_batch`
     smoke (hma/train_multi.py:238-244) — proof the production numeric
     stack (bf16 activations + remat + Pallas backwards at real shapes)
     produces gradients that actually learn, not just finite ones;
  3. d512 STMAR (the reference's 1B-class headline family,
     /root/reference/README.md:108-111): the FULL 40-domain ~1.5B-param
     card training on this ONE 16 GB chip (fp32 master params, bf16
     stochastic-rounded Adam moments, sliced gradients, remat) and the
     KV-cached MAR rollout (16 maskgit x 100 denoise, CFG off) with the
     fused denoise-loop Pallas kernel;
  4. KV-cached MaskGIT rollout (this framework's algorithm) vs the
     reference algorithm (full T-frame recompute per MaskGIT step, as in
     hma/generate.py:157 + st_mask_git.py:337-467) on the same hardware;
     `vs_baseline` is the speedup of ours over the reference algorithm
     ported 1:1 to this chip.

Secondary sections (2, 3) are individually guarded: a failure there
reports an error string in `detail` instead of losing the headline.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback

import numpy as np

# A healthy full run takes ~16 min (compile-cache cold) for the discrete
# sections; the MAR sections add a few more compiles, the largest being
# the 1B-class sliced-grad train step (~28 min cold, seconds when the
# persistent cache at /tmp/hma_tpu_jax_cache is warm). Round 5 adds the
# L0 tokenizer, decode-inclusive sim, MAR overfit and MAR reference-
# baseline sections (each with fresh compiles), and the remote compile
# service has been observed degraded (13 min for a trivial matmul,
# 2026-08-20) — hence the larger default. The axon tunnel can also
# hard-hang (observed: an 8h outage where even jnp.ones never returned
# and no exception was raised), which would stall the whole round-end
# pipeline — fail loudly instead.
WATCHDOG_SECS = int(os.environ.get("HMA_TPU_BENCH_TIMEOUT", 10800))


def _active_params(jax, params, stacked_mask, num_domains: int) -> int:
    """Parameter count under the ACTIVE convention: full size for trunk
    leaves, one domain row for (D, ...) stacked tables."""
    tot = 0
    for leaf, m in zip(jax.tree_util.tree_leaves(params),
                       jax.tree_util.tree_leaves(stacked_mask)):
        tot += leaf.size // num_domains if m else leaf.size
    return tot


def _watchdog():
    time.sleep(WATCHDOG_SECS)
    print(json.dumps({
        "metric": "rollout_frames_per_sec_chip_362M_discrete",
        "value": None,
        "unit": "frames/sec/chip",
        "error": f"bench exceeded {WATCHDOG_SECS}s — TPU tunnel "
                 f"unreachable/hung; no measurement taken",
    }), flush=True)
    os._exit(3)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.rollout.maskgit import make_generator, generate_tokens

    cfg = _flagship_config(num_domains=40)  # 40-embodiment flagship (~362M params)
    model = STMaskGIT(cfg)

    B = 8
    num_prompt = 2
    maskgit_steps = 2  # reference default (hma/generate.py:56)
    gen_frames = cfg.T - num_prompt

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    def force(out):
        """Device-to-host sync. block_until_ready doesn't actually block
        through the axon tunnel, so pull one scalar to the host."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn, *args, iters=20, warmup=2):
        for _ in range(warmup):
            force(fn(*args))
        # Enqueue all iterations (async dispatch pipelines them), then one
        # sync; the single ~30 ms tunnel round-trip amortizes over iters.
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        force(out)
        return (time.perf_counter() - t0) / iters

    # compile-time ledger (VERDICT r4 #7: first-run compile cost is a
    # real usability wall and was only recorded incidentally)
    compile_s: dict = {}

    def timed_compile(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        compile_s[name] = round(time.perf_counter() - t0, 1)
        return out

    # ---- training throughput first (fp32 master params): measured in a
    # clean allocator state — running it after the rollout section slows
    # the step 0.58 -> 0.65 s (HBM fragmentation from the inference
    # buffers), which under-reports training by ~11%.
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_train_step)

    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": domain_id}
    # trainer-default DomainSlicedOptimizer: Adam touches only the active
    # domain's slice of the (40, ...) stacked tables (0.305 -> 0.290
    # s/step vs dense optax adamw; experiments/mfu_probe.py sliced)
    import copy

    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(
        STMaskGIT(alt).init, {"params": jax.random.PRNGKey(0)},
        tokens, tokens, actions, domain_id)
    stacked_mask = domain_stacked_mask(params, other)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params, stacked_mask=stacked_mask,
        num_domains=cfg.num_domains)
    # remat: the 32-layer backward stores ~10 GB of attention logits
    # otherwise — rematerialize blocks instead
    train_model = STMaskGIT(cfg, remat=True)
    train_step = jax.jit(make_train_step(train_model, tx), donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None
    state, _ = timed_compile("discrete_train_step", train_step, state, batch,
                             jax.random.PRNGKey(0))

    s, _m = train_step(state, batch, jax.random.PRNGKey(1))  # warmup
    force(s.params["params"]["pos_embed_TSC"])
    t0 = time.perf_counter()
    for _ in range(20):
        s, _m = train_step(s, batch, jax.random.PRNGKey(1))
    force(s.params["params"]["pos_embed_TSC"])
    dt_train = (time.perf_counter() - t0) / 20
    tokens_per_step = B * cfg.T * cfg.S
    train_tokens_per_sec = tokens_per_step / dt_train
    # Two FLOP conventions (ADVICE r3 #2 / VERDICT r4 #6):
    #   - 6*N_total counts every domain's stacked table row (the
    #     model-size convention the reference's tokens/s/param numbers
    #     imply, hma/train_multi.py:1037-1038);
    #   - 6*N_active counts the trunk + ONE domain row — the parameters
    #     a step actually touches, i.e. real hardware work.
    train_tflops = 6 * n_params * tokens_per_step / dt_train / 1e12
    n_active = _active_params(jax, s.params, stacked_mask, cfg.num_domains)
    train_active_tflops = 6 * n_active * tokens_per_step / dt_train / 1e12

    # ---- overfit-one-batch convergence check on the SAME production
    # forward/backward (remat + Pallas kernels + sliced AdamW update):
    # keep stepping on the fixed batch until the masked-token loss
    # collapses. A wrong-but-finite Pallas backward at these shapes would
    # stall this descent; speed alone can't catch it. The loss is
    # label-smoothed (eps=0.01), so a perfectly memorized batch floors at
    # the smoothing entropy (~0.2363 for the flagship card) — convergence
    # is judged on the EXCESS over that analytic floor. wd=0 so no
    # regularizer fights memorization. experiments/overfit_probe.py is
    # the standalone version (adds per-step mask resampling + a rollout
    # -reproduces-the-batch check).
    overfit: dict = {}
    try:
        from hma_tpu.models.st_mask_git import smoothed_ce_floor

        floor = smoothed_ce_floor(cfg.num_factored_vocabs,
                                  cfg.factored_vocab_size)
        of_tx = make_domain_sliced_optimizer(
            3e-4, weight_decay=0.0, params_template=s.params,
            stacked_mask=stacked_mask, num_domains=cfg.num_domains)
        of_step = jax.jit(make_train_step(train_model, of_tx),
                          donate_argnums=(0,))
        del state
        state = TrainState(s.params, of_tx.init(s.params), jnp.asarray(0))
        target, cap, check_every = 0.05, 600, 25
        of_loss, of_acc, steps_done = None, None, 0
        for i in range(0, cap, check_every):
            for j in range(check_every):
                state, _m = of_step(state, batch,
                                    jax.random.PRNGKey(1000 + i + j))
            of_loss, of_acc = float(_m["loss"]), float(_m["acc"])
            steps_done += check_every
            if of_loss - floor < target and of_acc > 0.99:
                break
        overfit = {"final_loss": round(of_loss, 4), "final_acc": round(of_acc, 4),
                   "smoothing_floor": round(floor, 4),
                   "excess_loss": round(of_loss - floor, 4),
                   "steps": steps_done, "lr": 3e-4, "weight_decay": 0.0,
                   "converged": bool(of_loss - floor < target and of_acc > 0.99)}
        del of_step, of_tx
    except Exception:
        overfit = {"error": traceback.format_exc(limit=1)}

    # free the optimizer/train state and executables before the next
    # section. The train section must run with NOTHING else resident
    # (params were donated into it): holding even the 0.75 GB bf16
    # inference copy through training measurably slows the step (86 vs 96
    # TFLOP/s) — HBM headroom matters at this model size.
    del state, s, tx, train_step, train_model
    jax.clear_caches()

    # inference in bf16: halves HBM weight traffic, fp32 kept where it
    # matters (qk-norm, softmax, logits)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    run = make_generator(model, num_prompt_frames=num_prompt,
                         maskgit_steps=maskgit_steps)

    key = jax.random.PRNGKey(0)
    timed_compile("discrete_rollout", run, params, tokens, actions,
                  domain_id, key)
    dt = timed(run, params, tokens, actions, domain_id, key, iters=20,
               warmup=1)
    fps = B * gen_frames / dt

    # Reference algorithm on the same chip: full-stack forward per step
    # (scanned so compile time stays flat; the per-step compute matches
    # hma/evaluate.py:150-198 / generate.py:157 exactly).
    @jax.jit
    def reference_style(params, prompt, actions, domain_id, key):
        mask_id = cfg.image_vocab_size
        cur = jnp.where((jnp.arange(cfg.T) < num_prompt)[None, :, None], prompt, mask_id)

        def frame_body(cur, t):
            def step_body(cur, _):
                logits, _ = model.apply(params, cur, actions, domain_id,
                                        method=STMaskGIT.compute_logits)
                lt = jnp.take(logits, t, axis=2).reshape(
                    B, cfg.num_factored_vocabs, cfg.factored_vocab_size, cfg.S)
                ids = jnp.argmax(lt, axis=2)
                powers = cfg.factored_vocab_size ** jnp.arange(cfg.num_factored_vocabs)
                sample = jnp.sum(ids * powers[None, :, None], axis=1).astype(jnp.int32)
                cur = jax.lax.dynamic_update_slice_in_dim(
                    cur.reshape(B, cfg.T, cfg.S), sample[:, None], t, axis=1)
                return cur, None

            cur, _ = jax.lax.scan(step_body, cur, None, length=maskgit_steps)
            return cur, None

        cur, _ = jax.lax.scan(frame_body, cur, jnp.arange(num_prompt, cfg.T))
        return cur

    timed_compile("discrete_reference_algo", reference_style, params, tokens,
                  actions, domain_id, key)
    dt_ref = timed(reference_style, params, tokens, actions, domain_id, key, iters=5, warmup=1)
    fps_ref = B * gen_frames / dt_ref

    # ---- L0 tokenizer + decode-inclusive interactive latency (VERDICT
    # r4 #3: the reference's interactive loop pays a VQ decode per step,
    # sim/simulator.py:296, and its eval reports dec_time per frame,
    # evaluate.py:329-331; conv cost is weight-independent so random
    # weights measure it). Runs on the SAME resident discrete params so
    # the sim section reuses them; its own conv params are tiny.
    tok_sec: dict = {}
    sim_sec: dict = {}
    try:
        tok_sec, dec1 = _bench_tokenizer(jax, jnp, force, timed, timed_compile)
        sim_sec = _bench_sim(jax, jnp, force, timed_compile, model, params,
                             cfg, dec1)
    except Exception:
        tok_sec = tok_sec or {"error": traceback.format_exc(limit=1)}
        if not sim_sec:
            sim_sec = {"error": traceback.format_exc(limit=1)}

    # ---- d512 STMAR flagship (continuous family): train + rollout.
    # Last so its buffers can't fragment the headline sections above.
    del params
    jax.clear_caches()
    mar: dict = {}
    try:
        mar = _bench_mar(jax, jnp, force, timed, timed_compile)
    except Exception:
        mar = {"error": traceback.format_exc(limit=1)}

    print(json.dumps({
        "metric": "rollout_frames_per_sec_chip_362M_discrete",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / fps_ref, 2),
        "detail": {
            "params_M": round(n_params / 1e6, 1),
            "batch": B,
            "maskgit_steps": maskgit_steps,
            "gen_frames": gen_frames,
            "kv_cached_s_per_window": round(dt, 4),
            "reference_algo_fps_same_chip": round(fps_ref, 2),
            "per_frame_latency_ms_b1_equiv": round(dt / gen_frames / B * 1000, 2),
            "train_tokens_per_sec": round(train_tokens_per_sec),
            "train_model_tflops_per_sec": round(train_tflops, 1),
            "train_active_tflops_per_sec": round(train_active_tflops, 1),
            "params_active_M": round(n_active / 1e6, 1),
            "overfit": overfit,
            "tokenizer": tok_sec,
            "sim": sim_sec,
            "mar": mar,
            "compile_s": compile_s,
            "device": str(jax.devices()[0]),
        },
    }))


def _bench_tokenizer(jax, jnp, force, timed, timed_compile):
    """L0 MagVit2 codec throughput/latency at the production 256² card
    (VQConfig defaults = the released magvit2.ckpt architecture).
    Random weights: conv FLOPs and memory traffic are weight-independent.
    Returns (section dict, jitted batch-1 token decoder for the sim
    section)."""
    from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel, unnormalize_image

    out: dict = {}
    cfg = VQConfig()
    model = VQModel(cfg, dtype=jnp.bfloat16)
    B = 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)), jnp.float32)
    # init via eval_shape + host randoms: avoids compiling init programs
    # through the (slow) remote compile service
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs[:1])
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape).astype(
            np.dtype(s.dtype))), shapes)

    enc = jax.jit(lambda p, im: model.apply(p, im, method=VQModel.encode).indices)
    dec = jax.jit(lambda p, idx: unnormalize_image(
        model.apply(p, idx, method=VQModel.decode_code)))
    dec1 = jax.jit(lambda p, idx: unnormalize_image(
        model.apply(p, idx, method=VQModel.decode_code)))

    tok = timed_compile("tok_encode_b8", enc, params, imgs)
    tok = tok.astype(jnp.int32)  # one dtype for every decode compile
    dt_e = timed(enc, params, imgs, iters=10, warmup=1)
    timed_compile("tok_decode_b8", dec, params, tok)
    dt_d = timed(dec, params, tok, iters=10, warmup=1)
    timed_compile("tok_decode_b1", dec1, params, tok[:1])
    dt_d1 = timed(dec1, params, tok[:1], iters=10, warmup=1)

    out["encode_fps_256_b8"] = round(B / dt_e, 1)
    out["decode_fps_256_b8"] = round(B / dt_d, 1)
    out["dec_time_ms_b1"] = round(dt_d1 * 1000, 2)
    out["params_M"] = round(sum(
        x.size for x in jax.tree_util.tree_leaves(params)) / 1e6, 1)
    return out, (dec1, params)


def _bench_sim(jax, jnp, force, timed_compile, model, params, cfg, dec1):
    """Decode-INCLUSIVE interactive latency: one GenieSimulator step =
    the KV-window model dispatch + the 256² VQ decode the reference pays
    per keypress (sim/simulator.py:296). Amortizes the ~31 ms tunnel
    round-trip the way sim_probe._onchip_ms does: enqueue N (step,
    decode) program pairs, sync once."""
    from hma_tpu.sim.simulator import GenieSimulator

    decode_fn, tok_params = dec1
    out: dict = {}
    rng = np.random.default_rng(0)
    # token grid mismatch (sim card h=16 vs codec h=16: both 16² at 256²)
    sim = GenieSimulator(model, params, prompt_horizon=3, maskgit_steps=2)
    prompt = np.asarray(rng.integers(0, cfg.image_vocab_size,
                                     (3, cfg.h, cfg.h)), np.uint32)
    sim.set_initial_state(prompt, np.asarray(
        rng.normal(size=(3, cfg.max_d_action)), np.float32))

    window = jnp.asarray(sim._make_window())
    actions = jnp.asarray(np.concatenate(
        [sim._action_cache,
         np.zeros((1, cfg.max_d_action), np.float32)])[None])
    key = jax.random.PRNGKey(7)

    frame = timed_compile("sim_step", sim._step_fn, sim.params, window,
                          actions, key)
    idx = frame.reshape(1, cfg.h, cfg.h).astype(jnp.int32)
    force(decode_fn(tok_params, idx))  # decode warm (compiled in L0 at b1)

    iters = 20
    t0 = time.perf_counter()
    px = None
    for _ in range(iters):
        f = sim._step_fn(sim.params, window, actions, key)
        px = decode_fn(tok_params, f.reshape(1, cfg.h, cfg.h).astype(jnp.int32))
    force(px)
    out["p50_onchip_ms_with_decode"] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)
    return out


def _bench_mar(jax, jnp, force, timed, timed_compile) -> dict:
    """d512 STMAR: the FULL 40-domain 1B-class card (the reference's
    headline model) training on ONE 16 GB chip + the KV-cached MAR
    rollout (same card, bf16, 16 maskgit x 100 denoise, CFG off).

    Three features combine to fit ~1.5B params of train state on one
    v5e: bf16 stochastic-rounded Adam moments (train/lowp.py, 12 ->
    8 B/param persistent), sliced gradients (make_train_step(
    stacked_mask=...) — the backward produces one domain row instead of
    a full stacked zero-grad tree), and the optimization_barrier in the
    sliced moment update that keeps the donated tables updated in place
    (without it XLA copies every stacked table: +4 GB of temps -> OOM).
    The smaller 8-domain card's remat/sliced bake-off lives in
    experiments/artifacts/mar_step_r4.jsonl + PROFILE_r3.md; this
    section benches the production configuration (remat=True for
    activation headroom at the 1B scale)."""
    import copy
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "experiments"))
    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.rollout.mar import make_mar_generator
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_train_step)

    out: dict = {}
    B = 8

    cfg = _config(40)
    tm = STMAR(cfg, remat=True)
    lat, mask, actions, dom = _data(cfg, B)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "diffusion": jax.random.PRNGKey(1),
                 "action_drop": jax.random.PRNGKey(2)}
    params = tm.init(init_rngs, lat, lat, actions, dom, mask)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # structural stacked-leaf mask, exactly as the trainer derives it
    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(STMAR(alt, remat=True).init, init_rngs,
                           lat, lat, actions, dom, mask)
    stacked_mask = domain_stacked_mask(params, other)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params, stacked_mask=stacked_mask,
        num_domains=cfg.num_domains, moment_dtype=jnp.bfloat16)
    tm_sliced = STMAR(cfg, remat=True, single_domain_params=True)
    step = jax.jit(make_train_step(tm_sliced, tx, continuous=True,
                                   stacked_mask=stacked_mask),
                   donate_argnums=(0,))
    batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
             "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None
    state, _ = timed_compile("mar_train_step_1b", step, state, batch,
                             jax.random.PRNGKey(0))
    state, _m = step(state, batch, jax.random.PRNGKey(1))  # warm
    force(state.params["params"]["pos_embed_TSC"])
    t0 = time.perf_counter()
    for i in range(10):
        state, _m = step(state, batch, jax.random.PRNGKey(i))
    force(state.params["params"]["pos_embed_TSC"])
    dt = (time.perf_counter() - t0) / 10
    toks = B * cfg.T * (cfg.h // cfg.patch_size) ** 2
    hbm = (jax.local_devices()[0].memory_stats() or {}).get("peak_bytes_in_use")
    out["train1b_s_per_step"] = round(dt, 4)
    out["train1b_params_M_dom40"] = round(n_params / 1e6, 1)
    out["train1b_model_tflops_per_sec"] = round(6 * n_params * toks / dt / 1e12, 1)
    # active convention: trunk + one domain row (see the discrete
    # section's note — both numbers are reported deliberately)
    n_active = _active_params(jax, state.params, stacked_mask,
                              cfg.num_domains)
    out["train1b_active_tflops_per_sec"] = round(
        6 * n_active * toks / dt / 1e12, 1)
    out["train1b_params_active_M"] = round(n_active / 1e6, 1)
    out["train1b_loss_finite"] = bool(jnp.isfinite(_m["loss"]))
    if hbm:
        out["train1b_peak_hbm_gib"] = round(hbm / 2**30, 2)
    del state, step, tx, tm, tm_sliced
    jax.clear_caches()

    # rollout: the full 40-domain 1B-class card in bf16
    cfg = _config(40)
    model = STMAR(cfg)
    lat, _mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom,
        jnp.zeros((B, cfg.T, cfg.h, cfg.h), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    num_prompt = 2
    run = make_mar_generator(model, num_prompt_frames=num_prompt,
                             maskgit_steps=cfg.maskgit_steps)
    timed_compile("mar_rollout", run, params, lat, actions, dom,
                  jax.random.PRNGKey(0))
    dt = timed(run, params, lat, actions, dom, jax.random.PRNGKey(0),
               iters=4, warmup=0)
    gen_frames = cfg.T - num_prompt
    out["rollout_params_M"] = round(n_params / 1e6, 1)
    out["rollout_s_per_window"] = round(dt, 4)
    out["rollout_frames_per_sec"] = round(B * gen_frames / dt, 2)
    out["rollout_maskgit_steps"] = cfg.maskgit_steps
    out["rollout_diffusion_steps"] = cfg.num_sampling_steps

    # Reference MAR algorithm on the same chip (VERDICT r4 #4a): full
    # T-frame recompute per refinement step + resample-every-step
    # selection, ported 1:1 (rollout/mar.generate_latents_reference_algo)
    # — the denominator rollout_frames_per_sec was missing.
    try:
        from hma_tpu.rollout.mar import generate_latents_reference_algo

        ref_run = jax.jit(lambda p, l, a, d, k: generate_latents_reference_algo(
            model, p, l, num_prompt, a, d, k,
            maskgit_steps=cfg.maskgit_steps))
        timed_compile("mar_reference_algo", ref_run, params, lat, actions,
                      dom, jax.random.PRNGKey(0))
        dt_ref = timed(ref_run, params, lat, actions, dom,
                       jax.random.PRNGKey(0), iters=2, warmup=0)
        out["reference_algo_s_per_window"] = round(dt_ref, 4)
        out["reference_algo_fps_same_chip"] = round(B * gen_frames / dt_ref, 2)
        out["vs_reference_algo"] = round(dt_ref / dt, 2)
        del ref_run
    except Exception:
        out["reference_algo_error"] = traceback.format_exc(limit=1)

    # MAR overfit-one-batch convergence (VERDICT r4 #2): the continuous
    # family's learn-proof, same machinery as the standalone
    # experiments/mar_overfit_probe.py (d512 8-domain card — the probe's
    # shapes, so its compile-cache entries serve this section).
    del params, run, model
    jax.clear_caches()
    try:
        from mar_overfit_probe import run_overfit

        # early-stops at eval < 0.05; lr 1e-4 needs ~4-5k steps (~16 min
        # at 0.21 s/step) — the measured curve is in mar_overfit_r5.json
        cap = int(os.environ.get("HMA_TPU_BENCH_MAR_OVERFIT_STEPS", 5000))
        # lr=1e-4 (the trainer default): 3e-4 on this card detonates at
        # step ~278 through the reference-inherited temporal-attention
        # runaway (artifacts/mar_nan_forensic_r5.json) — the un-normalized
        # residual doubles per layer until the softmax backward overflows;
        # the production lr trains stably.
        out["overfit"] = run_overfit(lr=1e-4, max_steps=cap, log_every=100,
                                     skip_rollout_check=True)
    except Exception:
        out["overfit"] = {"error": traceback.format_exc(limit=1)}
    return out


if __name__ == "__main__":
    main()
