"""Metric registry (counterpart of ``model/metric.py``).

The reference ships a metrics module whose entries are never enabled (every
published config sets ``"metrics": []``, SURVEY.md §2.7); this registry
keeps the same config surface — ``"metrics": ["class_accuracy", ...]`` —
with working implementations.  CER/WER, the metrics the trainers actually
report, live in ``utils.error_rates``.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def class_accuracy(logits, labels, **_):
    """Top-1 accuracy over the class axis (``metric.py:10-14``)."""
    return jnp.mean(jnp.argmax(logits, -1) == labels)


def mean_iou(pred_mask, gt_mask, eps: float = 1e-8, **_):
    """Mean intersection-over-union of binary masks (``metric.py:22-33``)."""
    p = pred_mask > 0.5
    g = gt_mask > 0.5
    inter = jnp.sum(p & g, axis=(-2, -1))
    union = jnp.sum(p | g, axis=(-2, -1))
    return jnp.mean(inter / (union + eps))


METRICS: Dict[str, Callable] = {
    "class_accuracy": class_accuracy,
    "meanIOU": mean_iou,
}


def get_metric(name: str) -> Callable:
    if name not in METRICS:
        raise KeyError(f"unknown metric {name!r}; have {sorted(METRICS)}")
    return METRICS[name]
