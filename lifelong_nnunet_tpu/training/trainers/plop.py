"""PLOP and POD trainers (Pooled Output Distillation, ± pseudo-labeling).

Reference: ``nnunet_ext/training/network_training/plop/nnUNetTrainerPLOP.py``
(thresholds ``:113-182``, dual-forward iteration ``:217-328``) and
``pod/nnUNetTrainerPOD.py:88-96``; losses ``deep_supervision.py:217-380``,
``embeddings.py:3-42``.

TPU translation of the reference mechanics:
  * forward hooks on every conv module → ``capture_taps=True`` on the model
    (explicitly returned activations), for student and teacher in the same
    jitted step;
  * the per-class median-entropy thresholds (one epoch of teacher outputs,
    median via histograms) → device-side histogram accumulation scan;
  * the reference hard-resets batch size to 100 (2d) / 25 (3d) (``:85``) — a
    CUDA memory heuristic we do not copy; plans batch size is kept.

POD = PLOP without pseudo-labels: standard DC+CE base + POD distillation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.cl_losses import (accumulate_entropy_histogram, local_pod_loss,
                              median_entropy_thresholds, plop_pseudo_label_loss)
from ...ops.losses import deep_supervision_loss, ds_targets, ds_weights
from ..trainer import MultiHeadTrainer


class PLOPTrainer(MultiHeadTrainer):
    EXTENSION = "plop"
    TRANSFER_HEADS = True
    HYPERPARAMS = {"pod_lambda": float, "pod_scales": int}
    PSEUDO = True   # POD subclass turns this off

    def __init__(self, *args, pod_lambda: float = 1e-2, pod_scales: int = 3, **kw):
        kw.setdefault("pod_lambda", pod_lambda)
        kw.setdefault("pod_scales", pod_scales)
        super().__init__(*args, **kw)
        self.pod_lambda = float(pod_lambda)
        self.pod_scales = int(pod_scales)

    def init_cl_state(self):
        return {"teacher": None, "thresholds": None}

    def before_task(self, task: str):
        if self.mh is None or len(self.mh.tasks) <= 1:
            return
        prev = self.mh.tasks[-2]
        teacher = self.mh.assemble(prev)
        thresholds = None
        if self.PSEUDO:
            thresholds = self._compute_thresholds(task, teacher)
        self.cl_state = {"teacher": teacher, "thresholds": thresholds}
        self.logger(f"[{task}] PLOP teacher = model after {prev}"
                    + ("" if thresholds is None else ", thresholds computed"))

    def _compute_thresholds(self, task: str, teacher):
        """Median-entropy thresholds per DS output per class over one epoch of
        teacher predictions (reference ``extract_max_entropy_and_thresholds``,
        plop/…:113-182)."""
        model, nc, dsf = self.model, self.num_classes, self.ds_factors
        bins = 100

        @jax.jit
        def acc_step(hists, batch):
            outs = model.apply({"params": teacher}, batch["data"])
            tgts = ds_targets(batch["seg"].astype(jnp.int32), dsf[: len(outs)])
            return [accumulate_entropy_histogram(h, o, t, nc, bins)
                    for h, (o, t) in zip(hists, zip(outs, tgts))]

        n_out = len(self.ds_factors)
        hists = [jnp.zeros((nc, bins), jnp.float32) for _ in range(n_out)]
        sampler = self._make_sampler(task, train=True, seed_offset=555)
        for _ in range(self.opts.iters_per_epoch):
            b = sampler.next_batch()
            hists = acc_step(hists, {"data": jnp.asarray(b["data"]),
                                     "seg": jnp.asarray(b["seg"])})
        return [median_entropy_thresholds(h, None) for h in hists]

    def loss_extras(self):
        model = self.model
        dsf, batch_dice = self.ds_factors, self.batch_dice
        pod_lambda, scales = self.pod_lambda, self.pod_scales
        pseudo = self.PSEUDO

        def extras(params, cl_state, model_out, batch):
            outputs, taps = model_out["outputs"], model_out["taps"]
            seg = batch["seg"]
            if cl_state["teacher"] is None:
                return deep_supervision_loss(outputs, seg, dsf, batch_dice), {}
            t_out, t_taps = model.apply({"params": cl_state["teacher"]},
                                        batch["data"], capture_taps=True)
            pod = local_pod_loss(taps, t_taps, scales, pod_lambda)
            if pseudo:
                w = ds_weights(len(outputs))
                tgts = ds_targets(seg, dsf[: len(outputs)])
                ps = 0.0
                for i, (o, to, t) in enumerate(zip(outputs, t_out, tgts)):
                    if w[i] == 0.0:
                        continue
                    ps = ps + w[i] * plop_pseudo_label_loss(o, to, t,
                                                            cl_state["thresholds"][i])
                return ps + pod, {"plop_pseudo": ps, "pod": pod}
            base = deep_supervision_loss(outputs, seg, dsf, batch_dice)
            return base + pod, {"pod": pod}

        extras.replace_base = True
        extras.needs_taps = True
        return extras


class PODTrainer(PLOPTrainer):
    """POD-only variant: DC+CE + pod_lambda·local_POD, no pseudo-labels /
    thresholds (reference pod/…:88-96)."""
    EXTENSION = "pod"
    PSEUDO = False
