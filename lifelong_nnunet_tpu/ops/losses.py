"""Segmentation losses: soft Dice + cross-entropy with deep supervision.

Provides the upstream loss surface the reference builds on (SURVEY.md §2.8):
``DC_and_CE_loss`` (soft Dice over foreground classes + CE) and
``MultipleOutputLoss2`` (deep-supervision weights ``1/2^i`` normalized, the
lowest two resolutions zeroed — reference reimplements this at
``multihead/nnUNetTrainerMultiHead.py:1370-1387``).

All functions are pure and jit-safe.  ``target`` is integer class labels
``[B, *spatial]``; ``-1`` marks ignore (outside nonzero mask / padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def one_hot(target, num_classes):
    t = jnp.clip(target, 0, num_classes - 1).astype(jnp.int32)
    return jax.nn.one_hot(t, num_classes, dtype=jnp.float32)


def soft_dice_loss(logits, target, batch_dice: bool = True, smooth: float = 1e-5,
                   ignore_background: bool = True):
    """1 - soft Dice over foreground classes. logits [B,*sp,C], target [B,*sp].
    ``batch_dice=True`` pools tp/fp/fn over the whole batch (nnU-Net rule when
    batch size is small / 3D); else per-sample then averaged."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    valid = (target >= 0)[..., None].astype(jnp.float32)
    y = one_hot(target, num_classes) * valid
    p = probs * valid
    axes = tuple(range(0, logits.ndim - 1)) if batch_dice else tuple(range(1, logits.ndim - 1))
    tp = jnp.sum(p * y, axis=axes)
    fp = jnp.sum(p * (1.0 - y), axis=axes)
    fn = jnp.sum((1.0 - p) * y, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    if ignore_background:
        dc = dc[..., 1:] if batch_dice else dc[:, 1:]
    return 1.0 - dc.mean()


def cross_entropy_loss(logits, target, ignore_index: int = -1):
    """Mean CE over voxels with target != ignore_index."""
    num_classes = logits.shape[-1]
    valid = (target != ignore_index).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    y = one_hot(target, num_classes)
    ce = -(y * logp).sum(axis=-1)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def dc_and_ce_loss(logits, target, batch_dice: bool = True, smooth: float = 1e-5):
    return soft_dice_loss(logits, target, batch_dice, smooth) + cross_entropy_loss(logits, target)


def ds_weights(num_outputs: int) -> np.ndarray:
    """Deep-supervision weights: 1/2^i, the COARSEST output zeroed, normalized
    to sum 1.  Matches the reference's mask code
    (``multihead/nnUNetTrainerMultiHead.py:1380``: mask False only for
    ``i == net_numpool - 1``) — its "lowest 2 outputs" comment contradicts its
    own code, and the code is what trains."""
    w = np.array([1.0 / (2 ** i) for i in range(num_outputs)])
    if num_outputs >= 2:
        w[-1] = 0.0
    return (w / w.sum()).astype(np.float32)


def downsample_target(target, factor):
    """Nearest-neighbor downsample of integer targets by per-axis factor."""
    if all(f == 1 for f in factor):
        return target
    slicer = (slice(None),) + tuple(slice(None, None, int(f)) for f in factor)
    return target[slicer]


def ds_targets(target, ds_factors):
    return [downsample_target(target, f) for f in ds_factors]


def deep_supervision_loss(outputs: list, target, ds_factors, batch_dice: bool = True):
    """The plain (non-CL) training loss: weighted DC+CE over DS outputs.
    outputs: list of logits, highest resolution first; target [B, *spatial]."""
    w = ds_weights(len(outputs))
    targets = ds_targets(target, ds_factors[: len(outputs)])
    total = 0.0
    for i, (out, tgt) in enumerate(zip(outputs, targets)):
        if w[i] == 0.0:
            continue
        total = total + w[i] * dc_and_ce_loss(out, tgt, batch_dice)
    return total


def online_eval_counts(logits, target, num_classes: int):
    """Hard tp/fp/fn per foreground class from the full-res output — the
    upstream ``run_online_evaluation`` statistics used for the global-dice
    progress metric and the extended per-subject eval."""
    pred = jnp.argmax(logits, axis=-1)
    valid = target >= 0
    tps, fps, fns = [], [], []
    for c in range(1, num_classes):
        p = (pred == c) & valid
        y = (target == c) & valid
        tps.append(jnp.sum(p & y))
        fps.append(jnp.sum(p & ~y))
        fns.append(jnp.sum(~p & y))
    return jnp.stack(tps), jnp.stack(fps), jnp.stack(fns)
