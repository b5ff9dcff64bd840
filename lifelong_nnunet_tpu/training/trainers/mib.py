"""MiB trainer (Modeling the Background).

Reference: ``nnunet_ext/training/network_training/mib/nnUNetTrainerMiB.py``
(``:105-183``) — keeps a frozen copy of the previous model, dual forward per
iteration, loss = DS-weighted CE(ignore) + ``lkd``·UnbiasedKD per output
(``deep_supervision.py:383-416``); first task trains plain.  Defaults:
``mib_alpha=0.9, mib_lkd=10`` (CLI defaults, run_training.py:210).

TPU translation: the teacher is just a second parameter pytree in
``cl_state`` applied inside the same jitted step (the reference parks it on
``cuda:1``, SURVEY.md §2.7 — here sharding annotations handle placement).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.cl_losses import mib_loss
from ...ops.losses import deep_supervision_loss, ds_targets, ds_weights
from ..trainer import MultiHeadTrainer


class MiBTrainer(MultiHeadTrainer):
    EXTENSION = "mib"
    TRANSFER_HEADS = True
    HYPERPARAMS = {"mib_alpha": float, "mib_lkd": float}

    def __init__(self, *args, mib_alpha: float = 0.9, mib_lkd: float = 10.0, **kw):
        kw.setdefault("mib_alpha", mib_alpha)
        kw.setdefault("mib_lkd", mib_lkd)
        super().__init__(*args, **kw)
        self.mib_alpha = float(mib_alpha)
        self.mib_lkd = float(mib_lkd)

    def init_cl_state(self):
        return {"teacher": None}

    def before_task(self, task: str):
        if self.mh is not None and len(self.mh.tasks) > 1:
            prev = self.mh.tasks[-2]
            self.cl_state = {"teacher": self.mh.assemble(prev)}
            self.logger(f"[{task}] MiB teacher = model after {prev}")

    def loss_extras(self):
        model = self.model
        alpha, lkd = self.mib_alpha, self.mib_lkd
        nc = self.num_classes
        dsf = self.ds_factors

        batch_dice = self.batch_dice

        def extras(params, cl_state, model_out, batch):
            outputs = model_out["outputs"]
            seg = batch["seg"]
            w = ds_weights(len(outputs))
            tgts = ds_targets(seg, dsf[: len(outputs)])
            if cl_state["teacher"] is None:
                # first task: plain standard loss (reference falls back to the
                # MultiHead run_iteration, mib/…:105-115)
                return deep_supervision_loss(outputs, seg, dsf, batch_dice), {}
            t_out = model.apply({"params": cl_state["teacher"]}, batch["data"])
            t_out = [jnp.asarray(o) for o in t_out]
            loss = mib_loss(outputs, t_out, seg, w, tgts, old_num_classes=nc,
                            lkd=lkd, alpha=alpha)
            return loss, {"mib": loss}

        extras.replace_base = True
        return extras
