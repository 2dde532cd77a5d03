"""Composable loss functions — the strategy layer that replaces the
reference's three LightningModules' loss logic:

- cross-entropy with label smoothing + per-sample weights
  (reference: configs/training/base.yaml _target_ CE;
   lightning_modules.py:345-350 label smoothing)
- DeiT dual-head 0.5·CE(cls) + 0.5·CE(dist) when no teacher
  (reference: lightning_modules.py:455-462)
- distillation: (1−α)·CE + α·KL(student/T ‖ teacher/T)·T², or hard-CE on
  teacher argmax (reference: lightning_modules.py:949-974,
  deit_models.py:417-480 DistillationLoss)
- progressive α schedule by epoch (reference: lightning_modules.py:922-938)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean weighted CE over the batch; labels are int class ids."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_sample = -(onehot * logp).sum(axis=-1)
    if weights is None:
        return per_sample.mean()
    w = weights.astype(jnp.float32)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1e-6)


def mixed_cross_entropy(
    logits: jnp.ndarray,
    labels_a: jnp.ndarray,
    labels_b: jnp.ndarray,
    lam: jnp.ndarray | float,
    label_smoothing: float = 0.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MixUp/CutMix objective: λ·CE(y_a) + (1−λ)·CE(y_b)
    (reference: src/data/vit_transforms.py:396-462 — the mixed-label loss the
    reference defines but never wires; here it is the training-path consumer)."""
    return lam * cross_entropy(logits, labels_a, label_smoothing, weights) + \
        (1.0 - lam) * cross_entropy(logits, labels_b, label_smoothing, weights)


def soft_distillation(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 4.0,
) -> jnp.ndarray:
    """KL(softmax(teacher/T) ‖ softmax(student/T)) · T² (mean over batch)."""
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = (p * (jnp.log(jnp.clip(p, 1e-9, 1.0)) - s)).sum(axis=-1)
    return kl.mean() * t * t


def hard_distillation(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
) -> jnp.ndarray:
    """CE against the teacher's argmax (reference deit_models.py:466-472)."""
    teacher_labels = jnp.argmax(teacher_logits, axis=-1)
    return cross_entropy(student_logits, teacher_labels)


def distillation_loss(
    student_outputs: jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray],
    teacher_logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float | jnp.ndarray = 0.7,
    temperature: float = 4.0,
    distillation_type: str = "soft",
    label_smoothing: float = 0.0,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """(1−α)·CE(class head, y) + α·distill(dist head, teacher).

    For DeiT students `student_outputs` is (cls_logits, dist_logits); plain
    students use the same logits for both terms (reference:
    lightning_modules.py:952-974)."""
    if isinstance(student_outputs, tuple):
        cls_logits, dist_logits = student_outputs
    else:
        cls_logits = dist_logits = student_outputs
    class_loss = cross_entropy(cls_logits, labels, label_smoothing, weights)
    if distillation_type == "hard":
        dist = hard_distillation(dist_logits, teacher_logits)
    else:
        dist = soft_distillation(dist_logits, teacher_logits, temperature)
    loss = (1.0 - alpha) * class_loss + alpha * dist
    aux = {"class_loss": class_loss, "distillation_loss": dist,
           "teacher_agreement": (jnp.argmax(cls_logits, -1)
                                 == jnp.argmax(teacher_logits, -1)).mean()}
    return loss, aux


def deit_dual_loss(
    outputs: Tuple[jnp.ndarray, jnp.ndarray],
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """0.5·CE(cls) + 0.5·CE(dist) when training DeiT without a teacher
    (reference: lightning_modules.py:455-462)."""
    cls_logits, dist_logits = outputs
    return 0.5 * cross_entropy(cls_logits, labels, label_smoothing, weights) \
        + 0.5 * cross_entropy(dist_logits, labels, label_smoothing, weights)


def progressive_alpha(
    epoch: int,
    schedule: Optional[Sequence[Sequence[float]]] = None,
    default: float = 0.7,
) -> float:
    """Piecewise-constant α(epoch) from [[start_epoch, alpha], ...]
    (reference: lightning_modules.py:922-938)."""
    if not schedule:
        return default
    alpha = float(schedule[0][1])
    for start, a in schedule:
        if epoch >= start:
            alpha = float(a)
    return alpha


def classification_outputs_to_logits(outputs) -> jnp.ndarray:
    """Normalise model outputs to plain logits: DeiT train tuples average the
    heads; Inception train tuples take the main head (the aux term is added
    in the loss). Mirrors _handle_logits_shape (lightning_modules.py:412-439)."""
    if isinstance(outputs, tuple):
        return sum(outputs) / len(outputs)
    return outputs
