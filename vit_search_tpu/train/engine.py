"""Train/eval step factories.

The reference's per-iteration Python loop body (engine.py:57-190) becomes a
single pure function compiled once with ``jax.jit``:

  raw batch -> [device mixup/token-mixup] -> [teacher fwd] -> masked forward
  -> loss -> grads -> optimizer update -> EMA update -> metrics

Every stochastic element draws from explicit PRNG keys folded with the step
counter, replacing the reference's global-RNG save/seed/restore bracket
(engine.py:98,119-132,163-166).  Architecture keep-counts enter as data, so
multi-architecture supernet training reuses one compiled program.

Loss selection mirrors main.py:390-398 + engine.py:134-161:
  - token mixup: soft-target CE on cls + patch predictions ('seq'/'avg'),
  - mixup/cutmix: soft-target CE,
  - otherwise: label-smoothing CE,
  - optional KD: ``loss*(1-alpha) + kd*alpha`` on the distill head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..data import mixup as mixup_lib
from ..data.erasing import random_erasing
from ..models.supernet import build_arch_masks
from . import losses
from .state import TrainState, ema_update

Array = jnp.ndarray


def _normalize(images: Array, config: "TrainConfig") -> Array:
    """uint8 HWC batches from the loader -> normalized float on device."""
    if images.dtype != jnp.uint8:
        return images
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(config.mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(config.std, jnp.float32).reshape(1, 1, 1, -1)
    return (x - mean) / std


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_classes: int = 1000
    smoothing: float = 0.1
    # mixup mode: 'none' | 'mixup' (timm Mixup/CutMix) | 'token' (SwitchTokenMix)
    mixup_mode: str = "none"
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_prob: float = 1.0
    mixup_elem_mode: str = "batch"  # timm Mixup mode: batch | elem | pair
    cutmix_minmax: Optional[tuple] = None
    patch_len: int = 4              # token-mixup grid (56px patches: img/56)
    # knowledge distillation
    distill_alpha: float = 0.5
    hard_distill: bool = True
    distill_temperature: float = 3.0
    # EMA
    ema_decay: Optional[float] = None
    # device-side input processing (uint8 batches from the loader)
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)
    erasing_prob: float = 0.0
    erasing_mode: str = "pixel"     # --remode: pixel | rand | const
    erasing_count: int = 1          # --recount (timm max_count)


def make_train_step(model: Any, tx: optax.GradientTransformation,
                    config: TrainConfig,
                    teacher_apply: Optional[Callable[[Array], Array]] = None,
                    schedule: Optional[Callable] = None,
                    donate: bool = True,
                    counts_unpack: Optional[Callable] = None) -> Callable:
    """Build the jitted train step.

    Returns ``step(state, images, labels, counts, rng) -> (state, metrics)``.
    ``counts`` is the keep-count pytree (or None for dense training) and
    ``rng`` a per-epoch PRNG key; per-step keys are folded internally.
    With ``counts_unpack`` (``SupernetSchedules.unpack``), ``counts`` is a
    single packed int32 vector — one host->device transfer per step.
    """
    use_token_mixup = config.mixup_mode == "token"
    use_mixup = config.mixup_mode == "mixup"

    def step(state: TrainState, images: Array, labels: Array,
             counts: Optional[Dict], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        k_mix, k_drop, k_path, k_erase = jax.random.split(step_rng, 4)

        images = _normalize(images, config)
        images = random_erasing(k_erase, images, config.erasing_prob,
                                mode=config.erasing_mode,
                                count=config.erasing_count)

        batch = images.shape[0]
        if counts is not None and counts_unpack is not None:
            counts = counts_unpack(counts, batch)
        masks = build_arch_masks(counts, model.network_def, batch)

        patch_targets = None
        if use_token_mixup:
            images_m, targets, patch_targets = mixup_lib.switch_token_mix(
                k_mix, images, labels, config.patch_len, config.num_classes,
                config.smoothing)
        elif use_mixup:
            images_m, targets = mixup_lib.mixup_cutmix(
                k_mix, images, labels, config.num_classes,
                config.mixup_alpha, config.cutmix_alpha,
                config.mixup_switch_prob, config.smoothing,
                config.mixup_prob, mode=config.mixup_elem_mode,
                cutmix_minmax=config.cutmix_minmax)
        else:
            images_m, targets = images, None

        teacher_logits = None
        if teacher_apply is not None:
            teacher_logits = jax.lax.stop_gradient(teacher_apply(images_m))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if state.batch_stats else False
            out = model.apply(variables, images_m, masks, deterministic=False,
                              patch_output_type="seq",
                              rngs={"dropout": k_drop, "drop_path": k_path},
                              mutable=mutable)
            outputs, new_model_state = out if mutable else (out, {})

            if use_token_mixup:
                cls_pred, patch_pred = outputs
                loss = losses.soft_target_cross_entropy(cls_pred, targets)
                loss = loss + losses.soft_target_cross_entropy(
                    patch_pred, patch_targets)
                dst_pred = cls_pred
            else:
                if isinstance(outputs, tuple):
                    cls_pred, dst_pred = outputs
                else:
                    cls_pred = dst_pred = outputs
                if use_mixup:
                    loss = losses.soft_target_cross_entropy(cls_pred, targets)
                elif config.smoothing > 0:
                    loss = losses.label_smoothing_cross_entropy(
                        cls_pred, labels, config.smoothing)
                else:
                    loss = losses.cross_entropy(cls_pred, labels)
                if teacher_logits is not None:
                    kd = losses.distillation_loss(
                        dst_pred, teacher_logits, hard=config.hard_distill,
                        temperature=config.distill_temperature)
                    loss = loss * (1.0 - config.distill_alpha) + kd * config.distill_alpha
            return loss, new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and config.ema_decay:
            new_ema = ema_update(state.ema_params, new_params, config.ema_decay)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            ema_params=new_ema)

        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Any) -> Callable:
    """Build the jitted eval step.

    Returns ``eval_step(params, batch_stats, images, labels, counts)`` ->
    dict of summed metrics (loss_sum, top1, top5 [+ dst/joint variants when
    the model has a distill head], count).  Reference: engine.py:194-261.
    """

    config = TrainConfig()

    def eval_step(params, batch_stats, images: Array, labels: Array,
                  counts: Optional[Dict] = None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        images = _normalize(images, config)
        masks = build_arch_masks(counts, model.network_def, images.shape[0])
        outputs = model.apply(variables, images, masks, deterministic=True)

        if isinstance(outputs, tuple):
            cls_pred, dst_pred = outputs
        else:
            cls_pred, dst_pred = outputs, None

        batch = images.shape[0]
        metrics = {"count": jnp.asarray(batch, jnp.float32),
                   "loss_sum": losses.cross_entropy(cls_pred, labels) * batch}
        correct = losses.top_k_correct(cls_pred, labels)
        metrics["top1"] = correct["top1"].astype(jnp.float32)
        metrics["top5"] = correct["top5"].astype(jnp.float32)

        if dst_pred is not None:
            dst = losses.top_k_correct(dst_pred, labels)
            metrics["dst_top1"] = dst["top1"].astype(jnp.float32)
            metrics["dst_top5"] = dst["top5"].astype(jnp.float32)
            joint = (jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)
                     + jax.nn.softmax(dst_pred.astype(jnp.float32), axis=-1))
            jnt = losses.top_k_correct(joint, labels)
            metrics["jnt_top1"] = jnt["top1"].astype(jnp.float32)
            metrics["jnt_top5"] = jnt["top5"].astype(jnp.float32)
        return metrics

    return jax.jit(eval_step)


def make_per_example_correct_step(model: Any) -> Callable:
    """Per-example top-1 correctness — the primitive for batched candidate
    scoring in evolutionary search (replaces evo_search.py:253-287's
    per-candidate rebuild/eval loop)."""

    config = TrainConfig()

    def step(params, batch_stats, images: Array, labels: Array,
             counts: Optional[Dict] = None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        images = _normalize(images, config)
        masks = build_arch_masks(counts, model.network_def, images.shape[0])
        outputs = model.apply(variables, images, masks, deterministic=True)
        cls_pred = outputs[0] if isinstance(outputs, tuple) else outputs
        return (jnp.argmax(cls_pred, axis=-1) == labels).astype(jnp.float32)

    return jax.jit(step)
