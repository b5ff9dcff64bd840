"""The single jitted training step — the hot loop of every trainer.

The reference's per-method ``run_iteration`` overrides (SURVEY.md §3.2)
collapse into one pure function::

    (train_state, cl_state, batch, rng) -> (train_state, cl_state, metrics)

Differences between CL methods live entirely in the ``loss_extras`` callback
(EWC/RW penalties, LwF/MiB/PLOP distillation with a teacher forward) and in
the ``cl_state`` pytree (fisher, stored params, thresholds...) — both stay in
HBM across the whole run.  Augmentation is fused into the same XLA program
(device-side, `data/augment.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.augment import AugmentConfig, _augment_one
from ..ops.losses import deep_supervision_loss, online_eval_counts


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @staticmethod
    def create(params, tx):
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


@dataclass(frozen=True)
class StepConfig:
    ds_factors: tuple          # deep-supervision downsample factors
    batch_dice: bool
    num_classes: int           # incl. background
    augment: AugmentConfig | None = None


def make_train_step(model, tx, cfg: StepConfig,
                    loss_extras: Callable | None = None,
                    cl_state_update: Callable | None = None):
    """Build the jitted train step.

    loss_extras(params, cl_state, outputs, taps, batch) -> (extra_loss, aux)
        adds a CL regularization/distillation term (may run a teacher forward
        from params stored in cl_state).
    cl_state_update(cl_state, params, grads, loss) -> cl_state
        per-iteration CL state maintenance (e.g. RW online fisher EMA).
    """
    needs_taps = getattr(loss_extras, "needs_taps", False)
    replace_base = getattr(loss_extras, "replace_base", False)

    def loss_fn(params, cl_state, data, seg):
        if needs_taps:
            outputs, taps = model.apply({"params": params}, data, capture_taps=True)
        else:
            outputs = model.apply({"params": params}, data)
            taps = None
        aux = {}
        if replace_base:
            # methods like MiB/PLOP define the whole objective themselves
            base, aux = loss_extras(params, cl_state,
                                    {"outputs": outputs, "taps": taps},
                                    {"data": data, "seg": seg})
        else:
            base = deep_supervision_loss(outputs, seg, cfg.ds_factors, cfg.batch_dice)
            if loss_extras is not None:
                extra, aux = loss_extras(params, cl_state,
                                         {"outputs": outputs, "taps": taps},
                                         {"data": data, "seg": seg})
                base = base + extra
        return base, (outputs, aux)

    # NOTE: the state is deliberately NOT donated — the multi-head registry
    # (mh.body/heads) and CL anchors (EWC fisher snapshots) alias the same
    # buffers as the assembled param tree; donation would invalidate them.
    @jax.jit
    def train_step(state: TrainState, cl_state, batch, rng):
        data, seg = batch["data"], batch["seg"]
        if cfg.augment is not None:
            keys = jax.random.split(rng, data.shape[0])
            data, seg = jax.vmap(lambda k, d, s: _augment_one(k, d, s, cfg.augment))(
                keys, data, seg)
        seg = seg.astype(jnp.int32)
        (loss, (outputs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cl_state, data, seg)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        if cl_state_update is not None:
            cl_state = cl_state_update(cl_state, state.params, grads, loss)
        tp, fp, fn = online_eval_counts(outputs[0], seg, cfg.num_classes)
        metrics = {"loss": loss, "tp": tp, "fp": fp, "fn": fn, **aux}
        return new_state, cl_state, metrics

    return train_step


def make_eval_step(model, cfg: StepConfig):
    """Validation-loss step (no grad, no augmentation)."""

    @jax.jit
    def eval_step(params, batch):
        outputs = model.apply({"params": params}, batch["data"])
        seg = batch["seg"].astype(jnp.int32)
        loss = deep_supervision_loss(outputs, seg, cfg.ds_factors, cfg.batch_dice)
        tp, fp, fn = online_eval_counts(outputs[0], seg, cfg.num_classes)
        return {"loss": loss, "tp": tp, "fp": fp, "fn": fn}

    return eval_step
