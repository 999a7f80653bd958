"""Multi-dataset training driver.

Rebuild of the reference entry point (hma/train_multi.py): per-domain
memmap datasets from a datasplit YAML, temperature-weighted batch
sampling, a jitted sharded train step, periodic teacher-forced eval and
checkpointing. Differences are all TPU-architectural:
  - one process drives all local devices through a (dp, fsdp, tp) mesh
    (no torchrun/Accelerate process-per-GPU);
  - domains are integer ids into stacked parameter tables, so one
    compiled step serves every dataset in the mixture;
  - batches are assembled host-side by pure-numpy collators and fed as
    device arrays sharded on the batch axis.
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from hma_tpu.config import DiffusionGenieConfig, GenieConfig, load_config
from hma_tpu.data.collators import maskgit_collate, maskgit_collate_feature
from hma_tpu.data.datasets import RawFeatureDataset, RawTokenDataset
from hma_tpu.data.sampler import MultiTaskBatchSampler
from hma_tpu.models.st_mar import STMAR
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.parallel.distributed import (
    init_distributed,
    is_primary,
    local_slice,
    make_global_batch,
)
from hma_tpu.parallel.mesh import batch_sharding, make_mesh, make_param_shardings
from hma_tpu.train.lowp import resolve_moment_dtype
from hma_tpu.train.step import (
    TrainState,
    custom_cosine_schedule,
    domain_stacked_mask,
    make_domain_sliced_optimizer,
    make_eval_step,
    make_optimizer,
    make_train_step,
    scale_lr_by_batch,
)
from hma_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from hma_tpu.utils.logging import MetricLogger


@dataclass
class TrainArgs:
    """Mirrors the reference CLI surface (hma/train_multi.py:62-307)."""

    genie_config: str = ""
    output_dir: str = "out"
    train_split: str = "experiments/datasplit/dataset1.yaml"
    data_root: str = "data"
    model_type: str = "discrete"  # discrete | continuous
    window_size: int = 12
    stride: int = 1
    filter_overlaps: bool = False
    num_episodes_per_dataset: int = 1_000_000
    per_device_train_batch_size: int = 4
    per_device_eval_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    num_train_epochs: int = 2
    max_train_steps: Optional[int] = None
    max_eval_steps: int = 10
    # abort when ~this many consecutive steps are NaN-guard-skipped
    # (sampled at log points; 0 disables). A frozen run skips EVERY
    # step, so sampling is reliable for the failure this targets.
    max_nan_skip_steps: int = 200
    eval_every_n_steps: int = 1000
    vis_every_n_steps: int = 10_000_000
    lr_scheduler_type: str = "custom_cosine"
    num_warmup_steps: int = 500
    max_grad_norm: float = 1.0
    adam_beta_1: float = 0.9
    adam_beta_2: float = 0.999
    adam_eps: float = 1e-8
    checkpointing_steps: str = "1000"
    keep_checkpoints: int = 3
    seed: int = 42
    overfit_first_batch: bool = False
    resume_from_checkpoint: Optional[str] = None
    mu_transfer: bool = False
    action_network: Optional[str] = None
    run_name: str = ""
    report_to: str = "jsonl"
    # mesh
    dp: Optional[int] = None
    fsdp: int = 1
    tp: int = 1
    sp: int = 1
    log_every: int = 10
    grad_checkpointing: bool = True  # remat STBlocks in the train step
    save_second_epoch: bool = False  # pin the epoch-1 checkpoint (never pruned)
    use_native_loader: bool = False  # C++ prefetching loader (both families)
    # MagVit2 VQ checkpoint: enables pixel-space in-training visualization
    # (PSNR/LPIPS rollout metrics, reference: train_multi.py:324-464)
    tokenizer_checkpoint: Optional[str] = None
    lpips_weights: Optional[str] = None  # torch LPIPS(alex) state_dict path
    # Sliced AdamW over the (num_domains, ...) parameter stacks: update
    # only the active domain's slice each step (torch-AdamW-skips-unused
    # semantics + ~10x less optimizer HBM traffic; train/step.py
    # DomainSlicedOptimizer). Dense optax AdamW when off.
    domain_sliced_adam: bool = True
    # Adam moment storage: "float32" (default) or "bfloat16" (stochastic
    # rounding on write, fp32 math — halves optimizer HBM; train/lowp.py.
    # bf16 moments are what fit the 40-domain d512 1B card on one v5e).
    adam_moment_dtype: str = "float32"
    # Sliced gradients (train/step.py make_train_step(stacked_mask=...)):
    # dynamic-slice the active domain's row out of every stacked table
    # BEFORE jax.grad, so the backward never materializes the other
    # domains' zero grads (exact; ~6 GB transient saved at the 1B card).
    # "auto" = on when the domain-sliced optimizer is active and there is
    # no mesh (sharded stacked tables would turn the slice into a
    # cross-device gather each step); "on"/"off" force it.
    sliced_grads: str = "auto"


def build_domain_datasets(args: TrainArgs, config):
    """Per-domain train/val datasets + shared metadata
    (reference: train_multi.py:808-884)."""
    with open(args.train_split) as f:
        datasplit = yaml.safe_load(f)
    domains = [d.strip() for d in datasplit["domains"].split(",")]

    discrete = args.model_type == "discrete"
    fmt = ("{root}/{domain}_magvit_max1000000_{split}" if discrete
           else "{root}/{domain}_vae_max1000000_{split}")
    shared_keys = (("s", "h", "w", "vocab_size") if discrete
                   else ("s", "h", "w", "latent_channels"))
    cls = RawTokenDataset if discrete else RawFeatureDataset

    kwargs = dict(window_size=args.window_size, stride=args.stride,
                  max_traj_num=args.num_episodes_per_dataset,
                  use_actions=config.use_actions)
    if getattr(config, "drop_action_ratio", 0.0):
        # the reference plumbs this for the discrete family only
        # (train_multi.py:838-839); here both families support it — the
        # STMAR forward handles dropped actions, and dropped continuous
        # training calibrates the CFG uncond branch (rollout/mar.py)
        kwargs["drop_action_ratio"] = config.drop_action_ratio

    train_sets, val_sets, action_dims, action_stats = [], [], [], []
    for domain in domains:
        tdir = fmt.format(root=args.data_root, domain=domain, split="train")
        vdir = fmt.format(root=args.data_root, domain=domain, split="val")
        name_kw = {"name": domain} if discrete else {"domain": domain}
        tds = cls(tdir, filter_overlaps=args.filter_overlaps, **name_kw, **kwargs)
        train_sets.append(tds)
        action_dims.append(tds.n_action)
        if config.use_actions:
            action_stats.append(tds.action_stat)
        if args.overfit_first_batch:
            val_sets.append(tds)  # truncated to one batch in run_training
        else:
            val_sets.append(cls(vdir, filter_overlaps=True, **name_kw, **kwargs))

    meta = train_sets[0].metadata
    shared = {k: meta[k] for k in shared_keys if k in meta}
    return domains, train_sets, val_sets, action_dims, action_stats, shared


def configure_model(args: TrainArgs, config, domains, action_dims, action_stats,
                    shared_metadata):
    """Inject dataset-derived fields into the model config
    (reference: train_multi.py:875-894)."""
    config.use_mup = args.mu_transfer
    if "vocab_size" in shared_metadata:
        config.image_vocab_size = shared_metadata["vocab_size"]
    config.T = args.window_size
    config.S = shared_metadata["h"] * shared_metadata["w"]
    if args.model_type == "continuous":
        config.vae_embed_dim = shared_metadata["latent_channels"]
    if args.action_network is not None:
        config.action_network = args.action_network
    if config.use_actions:
        config.init_actions = True
        config.action_domains = domains
        config.d_actions = action_dims
        config.action_stats = action_stats
    # re-derive factored vocab
    config.__post_init__()
    return config


def _pad_actions(a: np.ndarray, width: int) -> np.ndarray:
    if a.shape[-1] == width:
        return a
    pad = np.zeros((*a.shape[:-1], width - a.shape[-1]), a.dtype)
    return np.concatenate([a, pad], axis=-1)


class BatchAssembler:
    """Sampler indices -> collated device-ready numpy batch."""

    def __init__(self, datasets, domains, config, args, rng, discrete: bool):
        self.datasets = datasets
        self.offsets = np.cumsum([0] + [len(d) for d in datasets[:-1]])
        self.domains = domains
        self.config = config
        self.args = args
        self.rng = rng
        self.discrete = discrete

    def __call__(self, global_indices: np.ndarray, step=None) -> dict:
        ds_idx = int(np.searchsorted(self.offsets, global_indices[0], side="right") - 1)
        local = global_indices - self.offsets[ds_idx]
        items = [self.datasets[ds_idx][int(i)] for i in local]
        collate = maskgit_collate if self.discrete else maskgit_collate_feature
        # Training passes `step`: the collate rng (mask schedule sampling)
        # is then derived from (seed, step) instead of a stateful stream,
        # so an interrupted+resumed run collates step k identically to an
        # uninterrupted one — resume is bit-exact
        # (tests/test_cli_train_generate.py::test_resume_equals_straight_run*).
        rng = (self.rng if step is None
               else np.random.default_rng([self.args.seed, int(step)]))
        batch = collate(items, self.config, rng)
        T = self.config.T
        B = len(items)
        h, w = batch["h"][0], batch["w"][0]
        out = {}
        if self.discrete:
            out["input_ids"] = batch["input_ids"].reshape(B, T, h * w)
            out["labels"] = batch["labels"].reshape(B, T, h * w)
        else:
            C = batch["input_ids"].shape[-1]
            out["input_ids"] = batch["input_ids"].reshape(B, T, h, w, C)
            out["labels"] = batch["labels"].reshape(B, T, h, w, C)
            out["masked_tokens_indicator"] = batch["masked_tokens_indicator"]
        if "action_ids" in batch:
            out["action_ids"] = _pad_actions(batch["action_ids"],
                                             self.config.max_d_action)
        out["domain_id"] = np.asarray(ds_idx, np.int32)
        return out


def make_model(args: TrainArgs, config, single_domain_params: bool = False):
    cls = STMaskGIT if args.model_type == "discrete" else STMAR
    return cls(config, remat=args.grad_checkpointing,
               single_domain_params=single_domain_params)


def run_training(args: TrainArgs) -> dict:
    """Main loop; returns final metrics (for tests)."""
    # Multi-host: connect to the coordinator (no-op unless HMA_TPU_* env /
    # TPU pod metadata indicates a multi-process launch). Must run before
    # the first jax.devices() call so the mesh spans every host.
    init_distributed()
    config = load_config(args.genie_config)
    if args.model_type == "continuous" and not isinstance(config, DiffusionGenieConfig):
        config = DiffusionGenieConfig(**{f.name: getattr(config, f.name)
                                         for f in dataclasses.fields(GenieConfig)})

    domains, train_sets, val_sets, action_dims, action_stats, shared = (
        build_domain_datasets(args, config))
    config = configure_model(args, config, domains, action_dims, action_stats, shared)
    discrete = args.model_type == "discrete"
    model = make_model(args, config)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, dp=args.dp, fsdp=args.fsdp, tp=args.tp,
                     sp=args.sp) if n_dev > 1 else None
    if mesh is not None and mesh.devices.size == 1:
        mesh = None  # explicit 1-device factors: plain single-device jit
    # global batch follows the mesh actually used (it may be a subset of
    # the visible devices — make_mesh with explicit factors)
    n_dev = mesh.devices.size if mesh is not None else 1

    B = args.per_device_train_batch_size * max(n_dev, 1)
    effective_batch = B * args.gradient_accumulation_steps
    lr = scale_lr_by_batch(args.learning_rate, effective_batch)

    if args.overfit_first_batch:
        # one effective batch total, reused for train and val
        # (reference: train_multi.py:852-858)
        for ds in train_sets:
            ds.valid_start_inds = ds.valid_start_inds[:effective_batch]

    # The sampler yields effective-batch-sized index lists; the jitted step
    # scans grad-accum microbatches of size B internally, so one sampler
    # draw == one optimizer update.
    sampler = MultiTaskBatchSampler([len(d) for d in train_sets],
                                    batch_size=effective_batch,
                                    temperature=3.0, seed=args.seed)
    steps_per_epoch = max(len(sampler), 1)
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

    if args.lr_scheduler_type == "custom_cosine":
        schedule = custom_cosine_schedule(lr, args.num_warmup_steps, max_steps)
    else:
        import optax

        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, args.num_warmup_steps, max_steps)

    rng_np = np.random.default_rng(args.seed)
    assembler = BatchAssembler(train_sets, domains, config, args, rng_np, discrete)
    native_loaders = None
    want_native = (args.use_native_loader and not args.overfit_first_batch
                   and not getattr(config, "drop_action_ratio", 0.0))
    # the C++ loader does not implement per-item action dropping; fall
    # back to the Python assembler when that knob is active. Creation is
    # deferred until start_step is known (after checkpoint restore): the
    # loader delivers batch i as a pure function of (seed, i), so passing
    # each loader the number of batches the interrupted run consumed from
    # it makes native-path resume draw exactly the data a straight run
    # would have drawn.

    def _make_native_loaders(start_counts):
        if discrete:
            from hma_tpu.data.native_loader import NativeTokenLoader as NL

            fmt = "{root}/{domain}_magvit_max1000000_train"
        else:
            from hma_tpu.data.native_loader import NativeFeatureLoader as NL

            fmt = "{root}/{domain}_vae_max1000000_train"
        return [NL(fmt.format(root=args.data_root, domain=d), config,
                   batch_size=effective_batch, seed=args.seed + i,
                   action_width=config.max_d_action,
                   start_batch=int(start_counts[i]))
                for i, d in enumerate(domains)]
    val_assembler = BatchAssembler(val_sets, domains, config, args,
                                   np.random.default_rng(0), discrete)

    # init params from one example batch
    example = next(iter(sampler))
    batch0 = assembler(example)
    init_rngs = {"params": jax.random.PRNGKey(args.seed),
                 "diffusion": jax.random.PRNGKey(args.seed + 1),
                 "action_drop": jax.random.PRNGKey(args.seed + 2)}
    dev_batch0 = {k: jnp.asarray(v) for k, v in batch0.items()}
    params = model.init(init_rngs, dev_batch0["input_ids"], dev_batch0["labels"],
                        dev_batch0.get("action_ids"), dev_batch0["domain_id"],
                        *([dev_batch0["masked_tokens_indicator"]] if not discrete else []))

    mup_mult = (config.d_model / 256.0) if args.mu_transfer else None
    mup_base_shapes = None
    if mup_mult is not None and mup_mult != 1.0:
        # mup.set_base_shapes semantics: infshapes come from diffing this
        # model against the same model at another width (head_dim halved);
        # eval_shape => no FLOPs (reference: st_mask_git.py:755-760).
        import dataclasses as _dc

        head_dim = config.d_model // config.num_heads
        base_cfg = _dc.replace(config,
                               d_model=config.num_heads * max(head_dim // 2, 1))
        base_model = make_model(args, base_cfg)
        mup_base_shapes = jax.eval_shape(
            base_model.init, init_rngs, dev_batch0["input_ids"],
            dev_batch0["labels"], dev_batch0.get("action_ids"),
            dev_batch0["domain_id"],
            *([dev_batch0["masked_tokens_indicator"]] if not discrete else []))
    if args.domain_sliced_adam and config.num_domains > 1:
        # Structural stacked-leaf mask: eval_shape the same model with one
        # extra domain — exactly the domain-stacked leaves change shape.
        import copy as _copy

        alt_cfg = _copy.deepcopy(config)
        alt_cfg.action_domains = list(config.action_domains) + ["__probe__"]
        alt_cfg.d_actions = list(config.d_actions) + [config.d_actions[-1]]
        if getattr(config, "action_stats", None):
            alt_cfg.action_stats = (list(config.action_stats)
                                    + [config.action_stats[-1]])
        alt_cfg.__post_init__()
        other = jax.eval_shape(
            make_model(args, alt_cfg).init, init_rngs,
            dev_batch0["input_ids"], dev_batch0["labels"],
            dev_batch0.get("action_ids"), dev_batch0["domain_id"],
            *([dev_batch0["masked_tokens_indicator"]] if not discrete else []))
        smask = domain_stacked_mask(params, other)
        tx = make_domain_sliced_optimizer(
            schedule, args.weight_decay, args.adam_beta_1,
            args.adam_beta_2, args.adam_eps, args.max_grad_norm,
            params_template=params,
            stacked_mask=smask,
            num_domains=config.num_domains, mup_width_mult=mup_mult,
            mup_base_shapes=mup_base_shapes,
            moment_dtype=resolve_moment_dtype(args.adam_moment_dtype))
    else:
        smask = None
        tx = make_optimizer(schedule, args.weight_decay, args.adam_beta_1,
                            args.adam_beta_2, args.adam_eps, args.max_grad_norm,
                            params_template=params, mup_width_mult=mup_mult,
                            mup_base_shapes=mup_base_shapes,
                            moment_dtype=resolve_moment_dtype(args.adam_moment_dtype))

    use_sliced_grads = smask is not None and (
        args.sliced_grads == "on"
        or (args.sliced_grads == "auto" and mesh is None))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        shardings = make_param_shardings(params, mesh)
        params = jax.device_put(params, shardings)
        # init the optimizer under jit so mu/nu inherit the param shardings;
        # leaves that come back on fewer devices (e.g. the step counter)
        # are re-put replicated over the full mesh
        rep = NamedSharding(mesh, PartitionSpec())
        opt_state = jax.jit(tx.init)(params)
        opt_state = jax.tree.map(
            lambda x: x if (hasattr(x, "sharding")
                            and len(x.sharding.device_set) == n_dev)
            else jax.device_put(x, rep), opt_state)
        step0 = jax.device_put(jnp.asarray(0), rep)
        state = TrainState(params, opt_state, step0)
    else:
        state = TrainState(params, tx.init(params), jnp.asarray(0))

    start_step = 0
    resume = args.resume_from_checkpoint
    if resume == "latest":
        resume = latest_checkpoint(args.output_dir)
    if resume:
        state = load_checkpoint(resume, state)
        start_step = int(state.step)

    if want_native:
        # Per-loader resume offsets: replay the task-selection stream the
        # interrupted run consumed (one rng per epoch, one choice per
        # step — must mirror the live loop's one-at-a-time draws exactly)
        # and count how many batches each loader delivered. O(start_step)
        # host-side Generator.choice(p=...) draws at ~5-20 us each: ~10 s
        # per million resumed steps, minutes at tens of millions — an
        # accepted startup cost; batching the draws would change the
        # stream and break bit-exactness with the live loop.
        start_counts = np.zeros(len(domains), np.int64)
        if start_step:
            task_dist = sampler.generate_tasks_distribution()
            done_epochs = start_step // steps_per_epoch
            for e in range(done_epochs + 1):
                r = np.random.default_rng(args.seed + e)
                n = (steps_per_epoch if e < done_epochs
                     else start_step % steps_per_epoch)
                for _ in range(n):
                    start_counts[int(r.choice(len(domains), p=task_dist))] += 1
        native_loaders = _make_native_loaders(start_counts)

    # One unified step for both families: grad-accum microbatches of size B
    # are scanned inside the jitted step (train/step.py). Donating the
    # state lets XLA update params/opt in place — measured ~1.5x train
    # throughput on v5e (tools/mfu_results.jsonl) and halves peak memory.
    microbatch = B if args.gradient_accumulation_steps > 1 else 0
    step_model = (make_model(args, config, single_domain_params=True)
                  if use_sliced_grads else model)
    train_step = jax.jit(make_train_step(
        step_model, tx, action_loss_weight=config.action_loss_weight,
        microbatch=microbatch, continuous=not discrete,
        stacked_mask=smask if use_sliced_grads else None),
        donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(
        model, action_loss_weight=config.action_loss_weight,
        continuous=not discrete))

    # Pixel-space in-training visualization (reference: train_multi.py:324-464)
    vis_decode = vis_lpips = None
    if args.tokenizer_checkpoint and discrete:
        from hma_tpu.rollout.decode import make_token_decoder
        from hma_tpu.tokenizer.convert import load_magvit2

        vis_decode = make_token_decoder(
            *load_magvit2(args.tokenizer_checkpoint))
        if args.lpips_weights:
            import torch

            from hma_tpu.metrics.lpips import (
                LPIPS,
                load_lpips_torch_weights,
                make_lpips_fn,
            )

            sd = torch.load(args.lpips_weights, map_location="cpu")
            lp = LPIPS(net="alex")
            vis_lpips = make_lpips_fn(load_lpips_torch_weights(lp, sd), net="alex")

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    exp_config = {**dataclasses.asdict(args), **{
        "model_parameters": int(n_params),
        "model_parameters_M": round(n_params / 1e6),
        "effective_batch_size": effective_batch,
        "seq_len": config.T * config.S,
        "FLOPs_per_update_step": 6 * n_params * effective_batch * config.T * config.S,
        "num_datasets": len(domains),
    }}
    # Multihost: process 0 owns logging; all processes run the loop.
    logger = MetricLogger(args.output_dir, project="video", config=exp_config,
                          use_wandb=args.report_to == "wandb",
                          enabled=is_primary())

    ckpt_every = int(args.checkpointing_steps) if str(args.checkpointing_steps).isdigit() else None
    put = batch_sharding(mesh) if mesh is not None else None
    multiproc = jax.process_count() > 1
    if multiproc:
        assert native_loaders is None, \
            "use_native_loader is single-host only (per-host data feeding " \
            "uses the Python assembler + make_array_from_process_local_data)"
        assert put is not None
    step_i = start_step
    # Resume fast-forward: replay the epoch and intra-epoch sampler
    # position the interrupted run was at, so resumed step k draws
    # exactly the indices step k of an uninterrupted run drew. Together
    # with the step-derived collate rng (BatchAssembler.__call__) this
    # makes resume bit-exact for the assembler path. The native path is
    # exact too: loaders were created above with start_batch = each
    # loader's consumed count (batch i is a pure function of (seed, i)),
    # and the skip loop below keeps the current epoch's task_rng stream
    # aligned without consuming loader batches.
    epoch = start_step // steps_per_epoch
    skip = start_step % steps_per_epoch
    t_last = time.time()
    last_metrics = {}
    nan_streak = 0  # consecutive log points whose sampled step was skipped

    while step_i < max_steps:
        sampler.set_epoch(epoch)
        dist = sampler.generate_tasks_distribution()
        task_rng = np.random.default_rng(args.seed + epoch)
        for indices in sampler:
            if step_i >= max_steps:
                break
            if skip > 0:
                skip -= 1
                if native_loaders is not None:
                    task_rng.choice(len(native_loaders), p=dist)
                continue
            # per-batch host-side fault tolerance: a bad shard/example must
            # not kill a long multi-dataset run (reference:
            # train_multi.py:556-591)
            try:
                if native_loaders is not None:
                    ds_idx = int(task_rng.choice(len(native_loaders), p=dist))
                    batch = native_loaders[ds_idx].next_batch()
                    batch["domain_id"] = np.asarray(ds_idx, np.int32)
                else:
                    # every process loads only its shard of the global batch
                    batch = assembler(local_slice(indices), step=step_i)
            except Exception as e:
                logger.log({"train/batch_error": str(e)[:200]}, step=step_i)
                if multiproc:
                    raise  # a desynced skip would deadlock the collective
                if native_loaders is not None:
                    # the native path's bit-exact resume contract assumes
                    # exactly one task-rng draw + one delivered batch per
                    # step; a swallowed error here would silently desync
                    # every future resume — fail loudly instead
                    raise
                continue
            if multiproc:
                dev = make_global_batch(batch, put)
            else:
                dev = {k: jnp.asarray(v) for k, v in batch.items()}
                if put is not None:
                    dev = {k: jax.device_put(v, put(v)) if getattr(v, "ndim", 0) >= 1
                           else v for k, v in dev.items()}
            state, metrics = train_step(state, dev, jax.random.PRNGKey(step_i))
            step_i += 1

            if step_i % args.log_every == 0 or step_i == max_steps:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                m["steps_per_sec"] = args.log_every / max(dt, 1e-9)
                m["lr"] = float(schedule(step_i))
                t_last = time.time()
                logger.log({f"train/{k}": v for k, v in m.items()}, step=step_i)
                last_metrics = m
                # Fail loudly when the NaN-guard freezes training: once
                # every backward is non-finite the guard skips forever
                # (params untouched, loss flat) and a long run silently
                # burns its budget. Observed: d512 STMAR runaway — the
                # un-normalized temporal-attention residual (reference
                # parity, hma/model/st_transformer.py:110) doubles the
                # stream per layer until the softmax backward overflows
                # fp32 (experiments/artifacts/mar_nan_forensic_r5.json).
                nan_streak = nan_streak + 1 if m.get("skipped") else 0
                if nan_streak * args.log_every >= args.max_nan_skip_steps > 0:
                    raise RuntimeError(
                        f"non-finite gradients for >= {nan_streak * args.log_every}"
                        f" consecutive steps at step {step_i} — training is"
                        " frozen (NaN-guard skipping every update). Lower the"
                        " lr, add weight decay, or set qk_norm=true; see"
                        " experiments/mar_nan_forensic.py for the diagnosis"
                        " workflow.")

            if step_i % args.eval_every_n_steps == 0 or step_i == max_steps:
                eval_metrics = run_eval(eval_step, state.params, val_assembler,
                                        val_sets, args, put)
                logger.log({f"val/{k}": v for k, v in eval_metrics.items()},
                           step=step_i)

            if (args.vis_every_n_steps and step_i % args.vis_every_n_steps == 0
                    and step_i < max_steps and discrete and not multiproc):
                vis = rollout_eval(model, state.params, val_assembler, val_sets,
                                   args, config, decode=vis_decode,
                                   lpips_fn=vis_lpips)
                logger.log({f"vis/{k}": v for k, v in vis.items()}, step=step_i)

            if ckpt_every and step_i % ckpt_every == 0:
                save_checkpoint(args.output_dir, f"step_{step_i}", state, config,
                                keep_last=args.keep_checkpoints)
        epoch += 1
        if args.checkpointing_steps == "epoch":
            save_checkpoint(args.output_dir, f"epoch_{epoch}", state, config,
                            keep_last=args.keep_checkpoints)
        if args.save_second_epoch and epoch == 1:
            # pinned checkpoint outside the retention policy
            # (reference: --save_second_epoch, train_multi.py:277-282)
            save_checkpoint(args.output_dir, "epoch_1_pinned", state, config)

    save_checkpoint(args.output_dir, "final_checkpt", state, config)
    logger.close()
    return last_metrics


def run_eval(eval_step, params, val_assembler, val_sets, args, put=None):
    """Teacher-forced eval over a few val batches using the jitted,
    sharded eval step (reference: train_multi.py:641-728). `eval_step`
    compiles once; batches are device_put with the training sharding so
    multi-device eval runs data-parallel, not replicated."""
    B = args.per_device_eval_batch_size * max(len(jax.devices()), 1)
    sampler = MultiTaskBatchSampler([len(d) for d in val_sets], batch_size=B,
                                    temperature=4.0, seed=0)
    metrics_acc: dict = {}
    n = 0
    multiproc = jax.process_count() > 1
    for i, indices in enumerate(sampler):
        if i >= args.max_eval_steps:
            break
        batch = val_assembler(local_slice(indices))
        if multiproc:
            dev = make_global_batch(batch, put)
        else:
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            if put is not None:
                dev = {k: jax.device_put(v, put(v)) if getattr(v, "ndim", 0) >= 1
                       else v for k, v in dev.items()}
        out = eval_step(params, dev, jax.random.PRNGKey(i))
        for k in ("loss", "acc", "action_loss"):
            if k in out:
                metrics_acc[k] = metrics_acc.get(k, 0.0) + float(out[k])
        n += 1
    out = {k: v / max(n, 1) for k, v in metrics_acc.items()}
    if "loss" in out:
        out["perplexity"] = math.exp(min(out["loss"], 30))
    return out


def rollout_eval(model, params, val_assembler, val_sets, args, config,
                 decode=None, lpips_fn=None):
    """Autoregressive rollout sanity during training: roll out future
    frames on one val batch and report token-level agreement; with a
    tokenizer checkpoint (`decode`), additionally decode prediction and
    ground truth to pixels and report PSNR/LPIPS like the reference's
    wandb rollout grids (reference: train_multi.py:324-464)."""
    from hma_tpu.rollout.maskgit import generate_tokens

    sampler = MultiTaskBatchSampler([len(d) for d in val_sets],
                                    batch_size=args.per_device_eval_batch_size,
                                    temperature=4.0, seed=1)
    indices = next(iter(sampler))
    batch = val_assembler(indices)
    tokens = jnp.asarray(batch["labels"])
    actions = (jnp.asarray(batch["action_ids"]) if "action_ids" in batch else None)
    out = generate_tokens(model, params, tokens, config.num_prompt_frames,
                          actions, jnp.asarray(batch["domain_id"]),
                          jax.random.PRNGKey(0), maskgit_steps=2)
    gen = np.asarray(out)[:, config.num_prompt_frames:]
    gt = np.asarray(tokens)[:, config.num_prompt_frames:]
    metrics = {"rollout_token_match": float((gen == gt).mean())}
    if decode is not None:
        from hma_tpu.metrics.image import batch_psnr

        h = w = int(math.isqrt(config.S))
        pred_px = decode(gen.reshape(-1, h, w))
        gt_px = decode(gt.reshape(-1, h, w))
        metrics["rollout_psnr"] = float(np.mean(batch_psnr(pred_px, gt_px)))
        if lpips_fn is not None:
            metrics["rollout_lpips"] = float(np.mean(lpips_fn(pred_px, gt_px)))
    return metrics
