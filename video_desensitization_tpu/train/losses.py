"""Multibox loss with hard negative mining (public RetinaFace objective)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1(pred: Array, target: Array) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def multibox_loss(
    loc_pred: Array,  # (B, A, 4)
    cls_logits: Array,  # (B, A, 2)
    landm_pred: Array,  # (B, A, 10)
    loc_t: Array,
    landm_t: Array,
    labels: Array,  # (B, A) int32: 0 bg, 1 face+landm, -1 face w/o landm
    neg_pos_ratio: float = 7.0,
    loc_weight: float = 2.0,
) -> Tuple[Array, Dict[str, Array]]:
    positive = labels != 0  # faces with or without landmarks
    with_landm = labels == 1
    num_pos = jnp.maximum(jnp.sum(positive, axis=1), 1)  # (B,)

    # Localization: smooth L1 over positives.
    loc_l = jnp.sum(smooth_l1(loc_pred, loc_t), axis=-1)  # (B, A)
    loss_loc = jnp.sum(jnp.where(positive, loc_l, 0.0), axis=1) / num_pos

    # Landmarks: only positives with landmark annotations.
    num_landm = jnp.maximum(jnp.sum(with_landm, axis=1), 1)
    landm_l = jnp.sum(smooth_l1(landm_pred, landm_t), axis=-1)
    loss_landm = jnp.sum(jnp.where(with_landm, landm_l, 0.0), axis=1) / num_landm

    # Classification with hard negative mining: all positives + the
    # neg_pos_ratio hardest negatives per image (by background CE loss).
    cls_target = positive.astype(jnp.int32)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, cls_target[..., None], axis=-1)[..., 0]  # (B, A)

    neg_score = jnp.where(positive, -jnp.inf, ce)
    order = jnp.argsort(-neg_score, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank of each anchor among negatives
    num_neg = jnp.minimum(
        (neg_pos_ratio * num_pos).astype(jnp.int32), positive.shape[1] - 1
    )
    hard_neg = rank < num_neg[:, None]

    selected = jnp.logical_or(positive, hard_neg)
    loss_cls = jnp.sum(jnp.where(selected, ce, 0.0), axis=1) / num_pos

    total = jnp.mean(loc_weight * loss_loc + loss_cls + loss_landm)
    metrics = {
        "loss": total,
        "loss_loc": jnp.mean(loss_loc),
        "loss_cls": jnp.mean(loss_cls),
        "loss_landm": jnp.mean(loss_landm),
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }
    return total, metrics
