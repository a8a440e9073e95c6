"""Training / evaluation driver (reference ``main.py`` parity).

Accepts the reference CLI surface (main.py:72-246) — every published
experiment script's flag set parses unchanged — and orchestrates the
TPU-native stack:

  data pipeline -> device mesh -> jitted train/eval steps -> epoch loop
  with supernet epoch schedules + rewiring, per-epoch eval (+ EMA eval),
  JSON log lines, checkpoints (checkpoint / epoch@N / best / best_ema).

Differences from the reference, by design:
- one process per host (not per device); devices are a mesh axis,
- mixup/token-mixup/random-erasing/normalization run on device inside the
  compiled step,
- architecture sampling is explicit keep-count data seeded by
  ``(epoch, step)``, replacing the global-RNG bracket (engine.py:119-132):
  ``single``/``hybrid`` shared widths come from the same seed on every
  host, ``multi`` keep counts are deterministic per host.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import threading
import time
from typing import Optional

import numpy as np

# Set by SIGTERM (scheduler preemption): the epoch loop checkpoints and
# exits cleanly so a relaunch with --resume continues (the submitit-requeue
# equivalent, reference run_with_submitit.py:62-72).
_PREEMPTED = threading.Event()


def _install_preemption_handler() -> None:
    def handler(signum, frame):
        _PREEMPTED.set()

    try:
        signal.signal(signal.SIGTERM, handler)
    except ValueError:
        pass  # not the main thread (tests)


def get_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("vit-search-tpu training and evaluation",
                                     add_help=False)
    parser.add_argument("--batch-size", default=64, type=int,
                        help="per-host batch size")
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--val-bs", default=64, type=int)

    # Model
    parser.add_argument("--model", default="deit_base_patch16_224", type=str)
    parser.add_argument("--input-size", default=224, type=int)
    parser.add_argument("--drop", type=float, default=0.0)
    parser.add_argument("--drop-path", type=float, default=0.1)
    parser.add_argument("--drop-block", type=float, default=None)  # loud below
    parser.add_argument("--model-ema", action="store_true")
    parser.add_argument("--no-model-ema", action="store_false", dest="model_ema")
    parser.set_defaults(model_ema=True)
    parser.add_argument("--model-ema-decay", type=float, default=0.99996)
    parser.add_argument("--model-ema-force-cpu", action="store_true", default=False)

    # Optimizer
    parser.add_argument("--opt", default="adamw", type=str)
    parser.add_argument("--opt-eps", default=1e-8, type=float)
    parser.add_argument("--opt-betas", default=None, type=float, nargs="+")
    parser.add_argument("--clip-grad", type=float, default=None)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight-decay", type=float, default=0.05)

    # LR schedule
    parser.add_argument("--sched", default="cosine", type=str)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--lr-noise", type=float, nargs="+", default=None)
    parser.add_argument("--lr-noise-pct", type=float, default=0.67)
    parser.add_argument("--lr-noise-std", type=float, default=1.0)
    parser.add_argument("--warmup-lr", type=float, default=1e-6)
    parser.add_argument("--min-lr", type=float, default=1e-5)
    parser.add_argument("--warmup-epochs", type=int, default=5)
    parser.add_argument("--decay-epochs", type=float, default=30)
    parser.add_argument("--cooldown-epochs", type=int, default=10)
    parser.add_argument("--decay-rate", "--dr", type=float, default=0.1)

    # Augmentation
    parser.add_argument("--color-jitter", type=float, default=0.4)
    parser.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    parser.add_argument("--smoothing", type=float, default=0.1)
    parser.add_argument("--train-interpolation", type=str, default="bicubic")
    parser.add_argument("--repeated-aug", action="store_true")
    parser.add_argument("--no-repeated-aug", action="store_false", dest="repeated_aug")
    parser.set_defaults(repeated_aug=True)
    parser.add_argument("--reprob", type=float, default=0.25)
    parser.add_argument("--remode", type=str, default="pixel")
    parser.add_argument("--recount", type=int, default=1)

    # Mixup
    parser.add_argument("--mixup", type=float, default=0.8)
    parser.add_argument("--cutmix", type=float, default=1.0)
    parser.add_argument("--cutmix-minmax", type=float, nargs="+", default=None)
    parser.add_argument("--mixup-prob", type=float, default=1.0)
    parser.add_argument("--mixup-switch-prob", type=float, default=0.5)
    parser.add_argument("--mixup-mode", type=str, default="batch")

    # Dataset
    parser.add_argument("--data-path", default="/datasets/imagenet", type=str)
    parser.add_argument("--data-set", default="IMNET", type=str)
    parser.add_argument("--inat-category", default="name", type=str)

    parser.add_argument("--output_dir", default="")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default="")
    parser.add_argument("--start_epoch", default=0, type=int)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--num_workers", default=10, type=int)
    parser.add_argument("--print-freq", default=100, type=int)

    # Knowledge distillation
    parser.add_argument("--teacher-ckpt-path", default=None, type=str)
    parser.add_argument("--teacher-model", default="regnety_160_upsample", type=str)
    parser.add_argument("--hard-distill", action="store_true", default=True)
    parser.add_argument("--distill-alpha", default=0.5, type=float)

    # Flexible ViT / supernet
    parser.add_argument("--network-def", default=None, type=str)
    parser.add_argument("--search-space", default=None, type=str)
    parser.add_argument("--example-per-arch", default=None, type=int)
    parser.add_argument("--num-warmup-epochs", default=30, type=int)
    parser.add_argument("--single-arch", action="store_true", default=False)
    parser.add_argument("--hybrid-arch", action="store_true", default=None)
    parser.add_argument("--use-holdout", action="store_true", default=False)
    parser.add_argument("--resume-supernet-weights", default=None, type=str)

    # Shifted patch token mixup
    parser.add_argument("--use-patch-mixup", action="store_true", default=False)
    parser.add_argument("--mixup-patch-len", default=4, type=int)
    parser.add_argument("--switch-prob", default=0.5, type=float)

    # Higher-resolution finetune
    parser.add_argument("--finetune", default=None, type=str)

    # TPU-specific
    parser.add_argument("--gelu", default="exact", choices=["exact", "tanh"],
                        help="GELU flavor: 'exact' (erf, matches the "
                             "reference's nn.GELU numerics) or 'tanh' "
                             "(faster approximation; see PERF.md)")
    parser.add_argument("--bf16", action="store_true", default=True,
                        help="bfloat16 compute (params stay f32)")
    parser.add_argument("--no-bf16", action="store_false", dest="bf16")
    parser.add_argument("--max-steps-per-epoch", default=None, type=int,
                        help="truncate epochs (smoke tests)")
    parser.add_argument("--loader-backend", default=None,
                        choices=["thread", "process"],
                        help="data-loader worker backend (default: thread, "
                             "or VST_LOADER_BACKEND); 'process' scales host "
                             "decode past the GIL like torch DataLoader "
                             "workers (reference main.py:291-306)")
    parser.add_argument("--profile-dir", default=None, type=str,
                        help="capture a jax.profiler trace of early steps")
    parser.add_argument("--profile-steps", default=8, type=int)
    return parser


def build_teacher(ckpt_path: str, default_model: str, num_classes: int,
                  dtype, logger):
    """Load the KD teacher, reconstructing it from the checkpoint's embedded
    argparse namespace when present (reference utils.py:218-238
    ``_load_teacher_model``: the ckpt's ``args.model``/``args.nb_classes``
    define the teacher; the CLI flag is only a fallback).  Drop rates are
    irrelevant here — the teacher always runs deterministically.
    """
    from .. import models, train

    t_raw = train.restore_raw(ckpt_path)
    t_args = (t_raw.get("metadata") or {}).get("args") or {}
    model_name = t_args.get("model", default_model)
    t_classes = t_args.get("nb_classes", t_args.get("num_classes",
                                                    num_classes))
    teacher = models.create_model(model_name, num_classes=int(t_classes),
                                  dtype=dtype)
    t_vars = {"params": t_raw["params"]}
    if t_raw.get("batch_stats"):
        t_vars["batch_stats"] = t_raw["batch_stats"]
    logger.info(f"teacher: {model_name} (num_classes={t_classes}) "
                f"from {ckpt_path}"
                + (" [reconstructed from ckpt args]" if t_args else ""))

    def teacher_apply(images):
        return teacher.apply(t_vars, images, deterministic=True)

    return teacher_apply


def main(args) -> dict:
    # GELU flavor is a trace-time compute knob like VST_PALLAS_ATTN (see
    # models/layers.py); the flag sets it for the duration of this run and
    # is restored after, so later in-process callers (tests, studies,
    # hub.load users) trace with their own — not this run's — flavor.
    prior_gelu = os.environ.get("VST_GELU")
    os.environ["VST_GELU"] = args.gelu
    try:
        return _main(args)
    finally:
        if prior_gelu is None:
            os.environ.pop("VST_GELU", None)
        else:
            os.environ["VST_GELU"] = prior_gelu


def _main(args) -> dict:
    import jax
    import jax.numpy as jnp

    from .. import arch, data, models, parallel, train, utils
    from ..models.supernet import SupernetSchedules

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.drop_block is not None:
        # Every model family here is ViT/DeiT — none has a drop-block op.
        # The reference forwards the flag to timm create_model
        # (main.py:90-95,249) where the ViT factories reject the kwarg, so
        # failing loudly here IS the parity behavior (vs silently training
        # without the requested regularizer).
        raise NotImplementedError(
            "--drop-block is not supported by any ViT/DeiT model family")

    mesh = parallel.create_mesh()
    is_main = parallel.is_main_process()
    logger = utils.file_logger(args.output_dir or None, is_master=is_main)
    logger.info(f"devices: {jax.devices()}")
    logger.info(str(args))

    np.random.seed(args.seed + jax.process_index())

    # --- data ------------------------------------------------------------
    train_transform = data.TrainTransform(
        size=args.input_size, rand_augment=args.aa,
        color_jitter=args.color_jitter, interpolation=args.train_interpolation)
    eval_transform = data.EvalTransform(size=args.input_size)

    dataset_train = data.build_dataset(
        True, data_set=args.data_set, data_path=args.data_path,
        transform=train_transform, use_holdout=args.use_holdout,
        inat_category=args.inat_category)
    dataset_val = data.build_dataset(
        False, data_set=args.data_set, data_path=args.data_path,
        transform=eval_transform, use_holdout=args.use_holdout,
        inat_category=args.inat_category)
    num_classes = dataset_train.num_classes

    n_proc, rank = parallel.process_count(), jax.process_index()
    if args.repeated_aug:
        train_sampler = data.RepeatedAugmentSampler(len(dataset_train), n_proc, rank)
    else:
        train_sampler = data.ShardedSampler(len(dataset_train), n_proc, rank)
    val_sampler = data.ShardedSampler(len(dataset_val), n_proc, rank, shuffle=False)

    loader_train = data.DataLoader(dataset_train, train_sampler, args.batch_size,
                                   num_workers=args.num_workers, drop_last=True,
                                   seed=args.seed,
                                   worker_backend=args.loader_backend)
    loader_val = data.DataLoader(dataset_val, val_sampler, args.val_bs,
                                 num_workers=args.num_workers, drop_last=False,
                                 seed=args.seed,
                                 worker_backend=args.loader_backend)

    # --- model -----------------------------------------------------------
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    network_def = (arch.parse_network_def(args.network_def)
                   if args.network_def else None)
    model_kwargs = dict(num_classes=num_classes, dtype=dtype,
                        dropout_rate=args.drop, drop_path_rate=args.drop_path,
                        img_size=args.input_size)
    if network_def is not None:
        model_kwargs["network_def"] = network_def
    model = models.create_model(args.model, **model_kwargs)
    network_def = model.network_def

    # supernet schedules (reference main.py:324-346 supernet kwargs wiring)
    schedules: Optional[SupernetSchedules] = None
    if models.is_supernet_model(args.model):
        if args.search_space is None:
            raise ValueError("--search-space required for supernet models")
        arch_mode = ("single" if args.single_arch
                     else "hybrid" if args.hybrid_arch else "multi")
        schedules = SupernetSchedules(
            network_def, arch.get_space(args.search_space),
            example_per_arch=args.example_per_arch,
            num_warmup_epochs=args.num_warmup_epochs, arch_mode=arch_mode)

    sample_images = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.float32)
    init_rngs = {"params": jax.random.PRNGKey(args.seed), "dropout": jax.random.PRNGKey(0)}
    variables = model.init(init_rngs, sample_images, deterministic=False)
    params, batch_stats = variables["params"], variables.get("batch_stats")

    n_parameters = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"number of params: {n_parameters}")

    # --- weight surgery entries (finetune / supernet inheritance) ---------
    if args.finetune:
        raw = train.restore_raw(args.finetune)
        src = raw.get("ema_params") or raw["params"]
        params = models.interpolate_pos_embeds(src, params, model.num_tokens)
        logger.info(f"finetune: loaded + interpolated pos embeds from {args.finetune}")
    if args.resume_supernet_weights:
        raw = train.restore_raw(args.resume_supernet_weights)
        params = models.slice_subnet_params(raw["params"], params)
        logger.info(f"inherited supernet weights from {args.resume_supernet_weights}")

    # --- teacher ----------------------------------------------------------
    teacher_apply = None
    if args.teacher_ckpt_path:
        teacher_apply = build_teacher(args.teacher_ckpt_path,
                                      args.teacher_model, num_classes, dtype,
                                      logger)

    # --- optimizer / steps --------------------------------------------------
    global_batch = args.batch_size * n_proc
    steps_per_epoch = len(loader_train)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    betas = args.opt_betas or (0.9, 0.999)
    ocfg = train.OptimConfig(
        base_lr=args.lr, min_lr=args.min_lr, warmup_lr=args.warmup_lr,
        warmup_epochs=args.warmup_epochs, epochs=args.epochs,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        global_batch_size=global_batch, steps_per_epoch=max(1, steps_per_epoch),
        beta1=betas[0], beta2=betas[1], eps=args.opt_eps,
        lr_noise=args.lr_noise, lr_noise_pct=args.lr_noise_pct,
        lr_noise_std=args.lr_noise_std, seed=args.seed,
        cooldown_epochs=args.cooldown_epochs, sched=args.sched,
        decay_epochs=args.decay_epochs, decay_rate=args.decay_rate)
    tx = train.make_optimizer(ocfg, params)
    state = train.TrainState.create(params, tx, batch_stats,
                                    use_ema=args.model_ema)

    mixup_active = (args.mixup > 0 or args.cutmix > 0
                    or args.cutmix_minmax is not None)  # reference main.py:309
    mixup_mode = ("token" if args.use_patch_mixup
                  else "mixup" if mixup_active else "none")
    tcfg = train.TrainConfig(
        num_classes=num_classes, smoothing=args.smoothing,
        mixup_mode=mixup_mode, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, mixup_switch_prob=args.mixup_switch_prob,
        mixup_prob=args.mixup_prob, mixup_elem_mode=args.mixup_mode,
        cutmix_minmax=(tuple(args.cutmix_minmax)
                       if args.cutmix_minmax else None),
        patch_len=args.mixup_patch_len,
        distill_alpha=args.distill_alpha, hard_distill=args.hard_distill,
        ema_decay=(args.model_ema_decay
                   if args.model_ema and not args.model_ema_force_cpu
                   else None),
        erasing_prob=args.reprob, erasing_mode=args.remode,
        erasing_count=args.recount)
    if args.use_patch_mixup and args.input_size != 56 * args.mixup_patch_len:
        raise ValueError("--input-size must equal 56 * --mixup-patch-len "
                         "(reference README constraint)")

    schedule = train.lr_schedule(ocfg)
    train_step = train.make_train_step(
        model, tx, tcfg, teacher_apply=teacher_apply, schedule=schedule,
        donate=True,
        counts_unpack=schedules.unpack if schedules is not None else None)
    eval_step = train.make_eval_step(model)

    state = parallel.replicate(mesh, state)

    ckpt = train.CheckpointManager(os.path.join(args.output_dir, "checkpoints")) \
        if args.output_dir else None

    start_epoch = args.start_epoch
    if args.resume:
        # 'auto' (or any non-path) resumes from this run's own checkpoint dir;
        # an explicit directory path restores that checkpoint (eval scripts
        # pass trained-model paths, reference main.py:401-416); an http(s)
        # URL is downloaded through the hub cache first (the torch.hub
        # load_state_dict_from_url path, reference main.py:402-404) —
        # either a reference-format torch file (weights only) or an
        # archived orbax checkpoint (full state + epoch).
        if args.resume.startswith(("http://", "https://")):
            from .. import hub

            local = hub.download(args.resume)
            if local.endswith(hub.TORCH_SUFFIXES):
                # Reference-format torch checkpoint (main.py:402-416):
                # model weights (+ BN buffers), EMA weights, epoch.  The
                # torch optimizer/scheduler states have no optax layout to
                # restore into — the epoch restore resumes the (stateless)
                # LR schedule at the right position, but Adam moments
                # restart; said loudly below.
                from ..tools.convert_torch import (convert_state_dict,
                                                   load_torch_checkpoint)

                state_dicts = load_torch_checkpoint(local)
                t_params, t_stats = convert_state_dict(state_dicts["model"],
                                                       model.network_def)
                t_ema = None
                if "model_ema" in state_dicts:
                    t_ema, _ = convert_state_dict(state_dicts["model_ema"],
                                                  model.network_def)
                if args.eval and t_ema is not None:
                    # "when evaluating, use model_ema" (main.py:415-416)
                    t_params = t_ema
                replace = {"params": parallel.replicate(mesh, t_params)}
                if t_stats:
                    replace["batch_stats"] = parallel.replicate(mesh, t_stats)
                if (args.model_ema and t_ema is not None
                        and state.ema_params is not None):
                    replace["ema_params"] = parallel.replicate(mesh, t_ema)
                state = state.replace(**replace)
                meta = {}
                if not args.eval and "epoch" in state_dicts:
                    meta["epoch"] = state_dicts["epoch"]
                    logger.warning(
                        "resume from torch checkpoint: epoch/LR schedule "
                        "and EMA restored, but torch optimizer moments "
                        "have no optax counterpart — optimizer state "
                        "restarts fresh")
                logger.info(f"resumed torch weights from {args.resume} "
                            f"(ema={'yes' if t_ema is not None else 'no'}, "
                            f"batch_stats={'yes' if t_stats else 'no'})")
            else:
                ckpt_dir = train.unpack_checkpoint_archive(local)
                mgr = train.CheckpointManager(os.path.dirname(ckpt_dir),
                                              snapshot_every=0)
                state, meta = mgr.restore(os.path.basename(ckpt_dir), state)
        elif args.resume != "auto" and os.path.isdir(args.resume):
            mgr = train.CheckpointManager(os.path.dirname(os.path.abspath(args.resume)),
                                          snapshot_every=0)
            state, meta = mgr.restore(os.path.basename(args.resume.rstrip("/")), state)
        elif ckpt and ckpt.exists("checkpoint"):
            state, meta = ckpt.restore("checkpoint", state)
        else:
            raise FileNotFoundError(f"--resume {args.resume}: no checkpoint found")
        if not args.eval:
            start_epoch = int(meta.get("epoch", -1)) + 1
        logger.info(f"resumed from epoch {meta.get('epoch')}")

    # Mid-epoch preemption resume: the preemption checkpoint holds the state
    # AFTER global step `preempted_step`, so re-entering the interrupted
    # epoch must SKIP the already-applied steps instead of re-applying them
    # on top of the mid-epoch state.  Skipping is exact: the per-step device
    # RNG keys off the restored ``state.step``, the arch keep-counts come
    # from a ``(seed, epoch)``-keyed host RNG that is advanced through the
    # skipped steps, and the loader order is a deterministic function of the
    # epoch — so the resumed trajectory is bitwise identical to an
    # uninterrupted run (tested: test_mid_epoch_preemption_resume_equivalence).
    resume_skip_steps = 0
    if args.resume and not args.eval and "preempted_step" in meta:
        saved_spe = int(meta.get("steps_per_epoch", 0))
        if saved_spe == steps_per_epoch and steps_per_epoch > 0:
            done = int(meta["preempted_step"]) + 1  # steps fully applied
            resume_skip_steps = done % steps_per_epoch
            if resume_skip_steps == 0:  # preempted exactly at an epoch end
                start_epoch = done // steps_per_epoch
            else:
                logger.info(
                    f"mid-epoch resume: skipping the first "
                    f"{resume_skip_steps} already-applied steps of epoch "
                    f"{start_epoch}")
        else:
            logger.warning(
                f"preempted checkpoint was saved with steps_per_epoch="
                f"{saved_spe} but this run has {steps_per_epoch}; "
                f"re-running the interrupted epoch from its start on the "
                f"mid-epoch state (trajectory will differ from an "
                f"uninterrupted run)")

    # --model-ema-force-cpu: the EMA copy lives in HOST memory and updates
    # there once per step — the reference's timm ModelEma(device='cpu')
    # device-memory workaround (reference main.py:136-137).  State is
    # created (and restored) with a device EMA slot so the checkpoint
    # layout is identical in both modes; here it moves to the host and the
    # jitted step runs EMA-free (ema_decay=None above).
    host_ema = None
    if args.model_ema and args.model_ema_force_cpu:
        src = state.ema_params if state.ema_params is not None else state.params
        host_ema = jax.device_get(src)
        state = state.replace(ema_params=None)

    eval_counts = schedules.full_counts() if schedules is not None else None

    def run_eval(params_tree):
        logger_eval = utils.MetricLogger(logger=logger)
        # Metric sums stay on device; the host fetches every
        # VST_EVAL_SYNC_EVERY batches (bounds the async queue over remote
        # backends) and once at the end — not one blocking round-trip per
        # batch (the reference's prefetch-eval intent, engine.py:194-261).
        # small default: deep unmaterialized queues degrade pathologically
        # over remote/tunneled backends (see PERF.md round 3)
        sync_every = int(os.environ.get(
            "VST_EVAL_SYNC_EVERY",
            os.environ.get("EVAL_SYNC_EVERY", "3")))  # legacy name
        totals: dict = {}
        device_acc, pending = None, 0

        def drain(acc):
            for k, v in acc.items():
                totals[k] = totals.get(k, 0.0) + float(v)

        for images, labels in parallel.prefetch_to_mesh(loader_val, mesh):
            m = eval_step(params_tree, state.batch_stats, images, labels, eval_counts)
            device_acc = m if device_acc is None else \
                jax.tree.map(jnp.add, device_acc, m)
            pending += 1
            if pending >= sync_every:
                drain(device_acc)
                device_acc, pending = None, 0
        if device_acc is not None:
            drain(device_acc)
        if not totals:
            return {}
        count = max(totals.pop("count"), 1.0)
        stats = {("acc1" if k == "top1" else "acc5" if k == "top5" else k):
                 v / count * (100.0 if k.startswith(("top", "dst", "jnt")) else 1.0)
                 for k, v in totals.items()}
        stats["loss"] = totals["loss_sum"] / count
        stats.pop("loss_sum", None)
        logger_eval.update(**stats)
        logger.info(f"eval: {stats}")
        return stats

    if args.eval:
        ema_tree = host_ema if host_ema is not None else state.ema_params
        if args.model_ema and ema_tree is not None and args.resume:
            eval_params = (parallel.replicate(mesh, ema_tree)
                           if host_ema is not None else ema_tree)
        else:
            eval_params = state.params
        stats = run_eval(eval_params)
        return {"eval": stats}

    # --- pre-finetune sanity eval (reference main.py:453-455) ---------------
    if args.finetune:
        run_eval(state.params)

    _install_preemption_handler()
    logger.info(f"Start training for {args.epochs} epochs "
                f"({steps_per_epoch} steps/epoch, global batch {global_batch})")
    max_acc, max_ema_acc = 0.0, 0.0
    epoch_rng = jax.random.PRNGKey(args.seed)
    t_start = time.time()
    result = {}

    for epoch in range(start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        skip_steps = resume_skip_steps if epoch == start_epoch else 0
        if schedules is not None:
            schedules.set_epoch(epoch)
            # epoch-boundary rewiring during warmup (vit_sr_supernet.py:465-477);
            # NOT on a mid-epoch resume — the restored state was already
            # rewired at this epoch's start before the preemption
            if epoch <= args.num_warmup_epochs and skip_steps == 0:
                state = state.replace(params=models.rewire_params(
                    state.params, network_def))

        metric_logger = utils.MetricLogger(logger=logger)
        metric_logger.add_meter("lr", utils.SmoothedValue(
            window_size=1, fmt="{value:.6f}"))

        # Per-step metrics stay on device; the host materializes a WINDOW of
        # them in one blocking fetch every `sync_every` steps, so the step
        # loop never waits on the device between syncs (the per-step
        # float(loss) round-trip was the CLI-vs-bench throughput gap, see
        # PERF.md round 5 "CLI-path throughput" for the measured cadence
        # cost over the tunnel).  Deviation from the reference (engine.py:170-173):
        # the non-finite-loss abort fires at window granularity, up to
        # sync_every-1 steps after the bad step.
        sync_every = max(1, int(os.environ.get(
            "VST_TRAIN_SYNC_EVERY", str(min(args.print_freq, 10)))))
        if host_ema is not None:
            sync_every = 1  # per-step params fetch already syncs
        pending = []

        def drain_pending():
            if not pending:
                return
            # stack the window's scalars ON DEVICE so the blocking fetch
            # moves one small array per metric key instead of one scalar
            # per (step, key) — over a remote/tunneled backend each
            # transfer is a round trip, and the per-scalar version
            # measured ~0.9 s per 10-step drain (PERF.md round 5
            # "CLI-path throughput")
            keys = list(pending[0])
            stacked = {k: jnp.stack([mv[k] for mv in pending]) for k in keys}
            fetched = jax.device_get(stacked)
            n = len(pending)
            pending.clear()
            for i in range(n):
                loss = float(fetched["loss"][i])
                if not np.isfinite(loss):
                    logger.error(f"Loss is {loss}, stopping training")
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch}")
                metric_logger.update(
                    loss=loss,
                    lr=(float(fetched["lr"][i]) if "lr" in fetched else 0.0))
        rng = jax.random.fold_in(epoch_rng, epoch)
        # arch sampling is host-independent (seeded by (seed, epoch) like
        # the reference RNG bracket, engine.py:119-132) but covers the
        # GLOBAL batch: every host computes the identical per-global-example
        # assignment, and its own shard picks out distinct architectures —
        # a pod step trains global_batch/example_per_arch distinct archs,
        # matching the reference's free per-rank RNG in multi mode
        host_rng = np.random.default_rng((args.seed, epoch))

        # device transfers run `depth` batches ahead of the step loop
        # (timm PrefetchLoader counterpart; see parallel.prefetch_to_mesh)
        device_batches = parallel.prefetch_to_mesh(loader_train, mesh)
        if os.environ.get("VST_BENCH_REUSE_BATCH") == "1":
            # CLI-path benchmarking: reuse the first device batch for the
            # whole epoch, taking host decode out of the measurement (the
            # dev box may have far fewer cores than a real TPU VM) while
            # keeping the entire CLI step path — sampling, jitted step,
            # metric drains, epoch accounting.  See PERF.md "CLI-path
            # throughput".
            import itertools
            device_batches = itertools.repeat(
                next(iter(device_batches)), steps_per_epoch)
        epoch_t0 = time.time()
        steps_done = 0
        for it, (images, labels) in enumerate(metric_logger.log_every(
                device_batches, args.print_freq, header=f"Epoch: [{epoch}]",
                total=steps_per_epoch)):
            if it >= steps_per_epoch:
                break
            global_step = epoch * steps_per_epoch + it
            if args.profile_dir and epoch == start_epoch and it == 1:
                jax.profiler.start_trace(args.profile_dir)
            # images is the GLOBAL (mesh-sharded) batch here
            counts = (schedules.sample_packed(host_rng, images.shape[0])
                      if schedules is not None else None)
            if it < skip_steps:
                # already applied before the preemption; the counts draw
                # above advanced the host RNG past this step
                continue
            state, metrics = train_step(state, images, labels, counts, rng)
            pending.append(metrics)
            steps_done += 1
            if host_ema is not None:
                # host-side ema_update twin (train/state.py:36-38); the
                # per-step params fetch is the documented cost of the flag
                d = args.model_ema_decay
                host_ema = jax.tree.map(
                    lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)
                                  ).astype(e.dtype),
                    host_ema, jax.device_get(state.params))
            if args.profile_dir and epoch == start_epoch and it == args.profile_steps:
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {args.profile_dir}")
            if len(pending) >= sync_every:
                drain_pending()
            if _PREEMPTED.is_set():
                drain_pending()
                logger.warning(f"preempted at epoch {epoch} step {it}; "
                               "checkpointing and exiting")
                if ckpt and is_main:
                    save_state = (state.replace(ema_params=host_ema)
                                  if host_ema is not None else state)
                    ckpt.save_epoch(save_state, epoch - 1,
                                    metadata={"max_acc": max_acc,
                                              "preempted_step": global_step,
                                              "steps_per_epoch": steps_per_epoch,
                                              "args": vars(args)})
                return {"preempted": True, "epoch": epoch, "step": it}

        drain_pending()  # blocks until the epoch's last step is done
        epoch_secs = time.time() - epoch_t0
        epoch_imgs_per_sec = (steps_done * global_batch / epoch_secs
                              if epoch_secs > 0 else 0.0)
        logger.info(f"Epoch: [{epoch}] throughput: "
                    f"{epoch_imgs_per_sec:.1f} imgs/s "
                    f"({steps_done} steps, global batch {global_batch})")
        metric_logger.synchronize_between_processes()
        train_stats = metric_logger.averages()
        train_stats["imgs_per_sec"] = epoch_imgs_per_sec
        logger.info(f"Averaged stats: {metric_logger}")

        # VST_BENCH_SKIP_EVAL: benchmarking-only companion to
        # VST_BENCH_REUSE_BATCH — long synthetic epochs need no per-epoch
        # eval pass (the throughput line above is the measurement; see
        # PERF.md "CLI-path throughput")
        skip_eval = (os.environ.get("VST_BENCH_REUSE_BATCH") == "1"
                     and os.environ.get("VST_BENCH_SKIP_EVAL") == "1")
        test_stats = {} if skip_eval else run_eval(state.params)
        ema_stats = {}
        ema_tree = host_ema if host_ema is not None else state.ema_params
        if args.model_ema and ema_tree is not None:
            if host_ema is not None:
                ema_tree = parallel.replicate(mesh, ema_tree)
            ema_stats = run_eval(ema_tree)

        acc1 = test_stats.get("acc1", 0.0)
        is_best = acc1 > max_acc
        max_acc = max(max_acc, acc1)
        ema_acc1 = ema_stats.get("acc1", 0.0)
        is_best_ema = ema_acc1 > max_ema_acc
        max_ema_acc = max(max_ema_acc, ema_acc1)
        logger.info(f"Max accuracy: {max_acc:.2f}%")

        log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                     **{f"test_{k}": v for k, v in test_stats.items()},
                     **{f"ema_test_{k}": v for k, v in ema_stats.items()},
                     "epoch": epoch, "n_parameters": n_parameters}
        result = log_stats
        if args.output_dir and is_main:
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")
        if ckpt and is_main:
            save_state = (state.replace(ema_params=host_ema)
                          if host_ema is not None else state)
            ckpt.save_epoch(save_state, epoch,
                            metadata={"max_acc": max_acc, "args": vars(args)},
                            is_best=is_best, is_best_ema=is_best_ema)

    total = time.time() - t_start
    logger.info(f"Training time {total:.0f}s")
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser("vit-search-tpu train", parents=[get_args_parser()])
    main(parser.parse_args())
