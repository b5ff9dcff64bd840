"""OwnM1–M4 hybrid trainers (the reference authors' research methods).

Reference: ``nnunet_ext/training/network_training/ownm{1..4}/`` and losses
``deep_supervision.py:419-621``:

  * OwnM1: EWC restricted to ViT params + MiB unbiased KD (α=1, lkd=10) +
    local POD on HEAD taps; transfer_heads=True; fisher after each task.
  * OwnM2: OwnM1 with EWC over the WHOLE network (no name filter).
  * OwnM3: OwnM2 with SPT patch embedding in the ViT (arch flag).
  * OwnM4: EWC + epoch-ramped pseudo-label MSE against the old model
    (``Own2`` loss: weight 0 before T1=epochs/10, ramps to ``pseudo_alpha=3``
    until T2=epochs−T1; pseudo applied every 13th iteration,
    ownm4/…:322-343) + POD; T1/T2 derived from num_epochs (ownm4/…:164-166).

Note: the reference's Own1 forward adds ``lkd_loss(x[0], y[0])`` — an
unbiased-KD term against the integer ground truth (deep_supervision.py:476) —
which is shape/type-inconsistent with the KD definition; we implement the
method as specified by its other terms and skip that line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.multihead import flatten
from ...ops.cl_losses import ewc_penalty, local_pod_loss, unbiased_kd_loss
from ...ops.losses import deep_supervision_loss, ds_weights
from .ewc import EWCTrainer


class OwnM1Trainer(EWCTrainer):
    EXTENSION = "ownm1"
    TRANSFER_HEADS = True
    HYPERPARAMS = {"mib_alpha": float, "mib_lkd": float, "pod_lambda": float,
                   "pod_scales": int, "ewc_lambda": float}
    PARAM_FILTER = (["vit"], True)     # EWC only on ViT
    DO_POD = True
    # POD taps restricted to the head region (reference hooks head convs only)
    POD_TAP_PREFIXES = ("seg",)

    def __init__(self, *args, mib_alpha: float = 1.0, mib_lkd: float = 10.0,
                 pod_lambda: float = 1e-2, pod_scales: int = 3, **kw):
        kw.setdefault("mib_alpha", mib_alpha)
        kw.setdefault("mib_lkd", mib_lkd)
        super().__init__(*args, **kw)
        self.mib_alpha = float(mib_alpha)
        self.mib_lkd = float(mib_lkd)
        self.pod_lambda = float(pod_lambda)
        self.pod_scales = int(pod_scales)

    def init_cl_state(self):
        return {"ewc_tasks": {}, "teacher": None}

    def before_task(self, task: str):
        if self.mh is not None and len(self.mh.tasks) > 1:
            prev = self.mh.tasks[-2]
            self.cl_state["teacher"] = self.mh.assemble(prev)
            self.logger(f"[{task}] {self.EXTENSION}: teacher = model after {prev}")

    def _filter_taps(self, taps: dict) -> dict:
        # decoder-stage taps feed the seg heads; the reference hooks the head
        # convs — our closest taps are the final decoder outputs
        return {k: v for k, v in taps.items() if k.startswith(("dec",))} \
            if "seg" in self.POD_TAP_PREFIXES else taps

    def loss_extras(self):
        lam, param_filter = self.ewc_lambda, self.PARAM_FILTER
        alpha, lkd = self.mib_alpha, self.mib_lkd
        model, nc = self.model, self.num_classes
        dsf, batch_dice = self.ds_factors, self.batch_dice
        do_pod, pod_lambda, scales = self.DO_POD, self.pod_lambda, self.pod_scales
        filter_taps = self._filter_taps

        def extras(params, cl_state, model_out, batch):
            outputs, taps = model_out["outputs"], model_out["taps"]
            seg = batch["seg"]
            base = deep_supervision_loss(outputs, seg, dsf, batch_dice)
            aux = {}
            if cl_state["ewc_tasks"]:
                flat = flatten(params)
                mask = None
                if param_filter is not None:
                    subs, include = param_filter
                    mask = {k: (all(s.lower() in k.lower() for s in subs) == include)
                            for k in flat}
                pen = ewc_penalty(flat, cl_state["ewc_tasks"], lam, mask)
                base = base + pen
                aux["ewc_penalty"] = pen
            if cl_state["teacher"] is not None:
                t_out, t_taps = model.apply({"params": cl_state["teacher"]},
                                            batch["data"], capture_taps=True)
                w = ds_weights(len(outputs))
                kd = 0.0
                for i, (o, to) in enumerate(zip(outputs, t_out)):
                    if w[i] == 0.0:
                        continue
                    kd = kd + w[i] * lkd * unbiased_kd_loss(o, to, nc, alpha)
                base = base + kd
                aux["mib_kd"] = kd
                if do_pod:
                    pod = local_pod_loss(filter_taps(taps), filter_taps(t_taps),
                                         scales, pod_lambda)
                    base = base + pod
                    aux["pod"] = pod
            return base, aux

        extras.replace_base = True
        extras.needs_taps = True
        return extras


class OwnM2Trainer(OwnM1Trainer):
    """EWC over the whole network (reference ownm2 header)."""
    EXTENSION = "ownm2"
    PARAM_FILTER = None


class OwnM3Trainer(OwnM2Trainer):
    """OwnM2 + SPT in the ViT (arch flag; applies once the ViT U-Net is the
    backbone — reference ownm3 header)."""
    EXTENSION = "ownm3"
    USE_SPT = True


class OwnM4Trainer(EWCTrainer):
    """EWC + ramped pseudo-label MSE vs the old model + POD (Own2 loss).
    Pseudo iterations: every 13th (reference ownm4/…:322-343); ramp weight 0
    before T1=E/10, linear to ``pseudo_alpha`` at T2=E−T1 (loss ``:568-573``,
    T1/T2 ``:164-166``)."""
    EXTENSION = "ownm4"
    TRANSFER_HEADS = True
    HYPERPARAMS = {"pseudo_alpha": float, "pod_lambda": float, "pod_scales": int,
                   "ewc_lambda": float}
    PARAM_FILTER = None
    DO_POD = True

    def __init__(self, *args, pseudo_alpha: float = 3.0, pod_lambda: float = 1e-2,
                 pod_scales: int = 3, **kw):
        kw.setdefault("pseudo_alpha", pseudo_alpha)
        super().__init__(*args, **kw)
        self.pseudo_alpha = float(pseudo_alpha)
        self.pod_lambda = float(pod_lambda)
        self.pod_scales = int(pod_scales)

    def init_cl_state(self):
        return {"ewc_tasks": {}, "teacher": None,
                "iter": jnp.asarray(0, jnp.int32),
                "epoch": jnp.asarray(0, jnp.int32)}

    def before_task(self, task: str):
        if self.mh is not None and len(self.mh.tasks) > 1:
            prev = self.mh.tasks[-2]
            self.cl_state["teacher"] = self.mh.assemble(prev)

    def cl_state_update(self):
        ipe = self.opts.iters_per_epoch

        def update(cl_state, params, grads, loss):
            it = cl_state["iter"] + 1
            return {**cl_state, "iter": it, "epoch": it // ipe}

        return update

    def loss_extras(self):
        lam = self.ewc_lambda
        model = self.model
        dsf, batch_dice = self.ds_factors, self.batch_dice
        alpha = self.pseudo_alpha
        pod_lambda, scales = self.pod_lambda, self.pod_scales
        E = self.opts.num_epochs
        t1, t2 = E / 10.0, E - E / 10.0

        def extras(params, cl_state, model_out, batch):
            outputs, taps = model_out["outputs"], model_out["taps"]
            seg = batch["seg"]
            base = deep_supervision_loss(outputs, seg, dsf, batch_dice)
            aux = {}
            if cl_state["teacher"] is None:
                if cl_state["ewc_tasks"]:
                    pen = ewc_penalty(flatten(params), cl_state["ewc_tasks"], lam)
                    base = base + pen
                return base, aux
            epoch = cl_state["epoch"].astype(jnp.float32)
            ramp = jnp.clip((epoch - t1) / max(t2 - t1, 1e-6), 0.0, 1.0) * alpha
            is_pseudo_iter = (cl_state["iter"] % 13) == 0
            weight = jnp.where(is_pseudo_iter, ramp, 0.0)
            t_out, t_taps = model.apply({"params": cl_state["teacher"]},
                                        batch["data"], capture_taps=True)
            w = ds_weights(len(outputs))
            mse = 0.0
            for i, (o, to) in enumerate(zip(outputs, t_out)):
                if w[i] == 0.0:
                    continue
                mse = mse + w[i] * jnp.mean((o - jax.lax.stop_gradient(to)) ** 2)
            # pseudo iters with weight>0 drop the EWC penalty (reference Own2
            # forward); otherwise EWC applies
            pen = ewc_penalty(flatten(params), cl_state["ewc_tasks"], lam) \
                if cl_state["ewc_tasks"] else 0.0
            base = base + weight * mse + jnp.where(weight > 0, 0.0, 1.0) * pen
            aux["pseudo_mse"] = mse
            if self.DO_POD:
                pod = local_pod_loss(
                    {k: v for k, v in taps.items() if k.startswith("dec")},
                    {k: v for k, v in t_taps.items() if k.startswith("dec")},
                    scales, pod_lambda)
                base = base + pod
                aux["pod"] = pod
            return base, aux

        extras.replace_base = True
        extras.needs_taps = True
        return extras
