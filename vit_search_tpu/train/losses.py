"""Training losses.

- cross-entropy on integer labels (eval; reference engine.py:195),
- label-smoothing cross-entropy (timm ``LabelSmoothingCrossEntropy``; used
  when training without mixup, main.py:390-398),
- soft-target cross-entropy for mixup/token-mixup targets
  (timm ``SoftTargetCrossEntropy``),
- knowledge distillation: hard (CE against the teacher argmax) and soft
  (temperature-scaled KL), reference engine.py:25-54.

All losses compute log-softmax in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _log_softmax(x: Array) -> Array:
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean CE against integer labels."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return nll.mean()


def label_smoothing_cross_entropy(logits: Array, labels: Array,
                                  smoothing: float = 0.1) -> Array:
    logp = _log_softmax(logits)
    n = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    nll = nll.squeeze(-1)
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_cross_entropy(logits: Array, targets: Array) -> Array:
    """Mean of ``-sum(target * log_softmax(logits))`` over all leading axes.

    Works for ``(B, K)`` class targets and ``(B, N, K)`` patch targets.
    """
    logp = _log_softmax(logits)
    return (-(targets.astype(jnp.float32) * logp).sum(axis=-1)).mean()


def distillation_loss(student_logits: Array, teacher_logits: Array,
                      hard: bool = True, temperature: float = 3.0) -> Array:
    """Hard or soft KD (reference engine.py:25-54)."""
    if hard:
        teacher_labels = jnp.argmax(teacher_logits, axis=-1)
        return cross_entropy(student_logits, teacher_labels)
    t = temperature
    teacher_probs = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logp = _log_softmax(student_logits / t)
    return jnp.mean(jnp.sum(-teacher_probs * logp, axis=-1)) * (t * t)


def top_k_correct(logits: Array, labels: Array, ks=(1, 5)) -> dict:
    """Per-batch correct counts for top-k accuracies (timm ``accuracy``)."""
    out = {}
    num_classes = logits.shape[-1]
    max_k = min(max(ks), num_classes)
    _, top = jax.lax.top_k(logits.astype(jnp.float32), max_k)
    hit = top == labels[..., None].astype(top.dtype)
    for k in ks:
        out[f"top{k}"] = hit[..., : min(k, num_classes)].any(axis=-1).sum()
    return out
