"""Optimizer + LR schedule: nnU-Net's training recipe as optax transforms.

Upstream recipe (SURVEY.md §2.8): SGD(lr=0.01, momentum=0.99, nesterov,
weight_decay=3e-5), poly LR ``0.01 * (1 - epoch/max_epochs)^0.9``, gradient
clipping at global-norm 12 (reference clips per iteration,
``multihead/nnUNetTrainerMultiHead.py:598-656``).  The reference builds the
optimizer over ``filter(requires_grad)`` params (``:294-301``); here frozen
subsets are an ``optax.masked`` wrapper (mask from
``MultiHeadParams.trainable_mask`` or ``name_filter_mask``).
"""

from __future__ import annotations

import optax


def poly_lr_schedule(initial_lr: float, max_epochs: int, iters_per_epoch: int,
                     exponent: float = 0.9):
    def schedule(step):
        epoch = step // iters_per_epoch
        frac = 1.0 - epoch / max_epochs
        return initial_lr * (frac ** exponent)
    return schedule


def make_optimizer(max_epochs: int, iters_per_epoch: int, initial_lr: float = 1e-2,
                   momentum: float = 0.99, weight_decay: float = 3e-5,
                   clip_norm: float = 12.0, trainable_mask=None) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(
            learning_rate=poly_lr_schedule(initial_lr, max_epochs, iters_per_epoch),
            momentum=momentum, nesterov=True,
        ),
    )
    if trainable_mask is not None:
        tx = optax.chain(optax.masked(tx, trainable_mask),
                         optax.masked(optax.set_to_zero(), _invert(trainable_mask)))
    return tx


def _invert(mask):
    import jax
    return jax.tree.map(lambda b: not b, mask)
