"""LwF trainer (Learning without Forgetting).

Reference: ``nnunet_ext/training/network_training/lwf/nnUNetTrainerLWF.py``
— two-phase per new task: (1) ``freeze_run`` trains the new head with a
frozen body (``:189-244``, checkpoint ``model_freezed``); (2) joint training
where EVERY head predicts each batch and a temperature-KL distills previous
heads toward target logits (``run_iteration`` ``:298-370``; targets from
``calculate_target_logits``, helpful_functions.py:207-266, cycled
``batch_idx % 250``).

TPU translation (documented deviation): the reference caches one epoch of
teacher logits and cycles them, which only aligns logits with their input
batch in the first epoch (the generators are ``tee``-copied).  We instead
snapshot the OLD model parameters per previous head at task start and compute
the target logits on the fly inside the jitted step — exact input/target
alignment under augmentation, one extra forward per previous head (the
reference also pays one forward per head per iteration).  Previous heads
remain trainable during the joint phase (as in the reference, where
distillation gradients flow into every head): the step's param tree is
``{'main': body+active head, 'prev_heads': {task: head leaves}}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ...models.multihead import flatten, unflatten
from ...ops.cl_losses import lwf_distill_loss
from ...ops.losses import deep_supervision_loss, online_eval_counts
from ..train_step import TrainState
from ..trainer import MultiHeadTrainer
from ...data.augment import AugmentConfig, _augment_one


class LwFTrainer(MultiHeadTrainer):
    EXTENSION = "lwf"
    TRANSFER_HEADS = False
    HYPERPARAMS = {"lwf_temperature": float}

    def __init__(self, *args, lwf_temperature: float = 2.0,
                 freeze_epochs: int | None = None, **kw):
        kw.setdefault("lwf_temperature", lwf_temperature)
        super().__init__(*args, **kw)
        self.lwf_temperature = float(lwf_temperature)
        self.freeze_epochs = freeze_epochs  # None -> num_epochs (reference runs a full freeze phase)
        self._joint_phase = False

    def init_cl_state(self):
        return {"old_models": None}  # {prev_task: nested params}

    # ------------------------------------------------ phase-aware checkpoints
    def extra_manifest(self):
        # 0 = first task (plain), 1 = freeze_run, 2 = joint distillation —
        # lets ``-c`` resume re-enter the correct phase (reference LwF has no
        # mid-task resume at all; its phases restart)
        phase = 2 if self._joint_phase else (
            1 if getattr(self, "_freeze_body", False) else 0)
        return {"lwf_phase": phase}

    def _adopt_manifest(self, manifest):
        self._loaded_phase = int(manifest.get("lwf_phase", 0))
        # set the phase flags BEFORE _build_step so the rebuilt step/optimizer
        # (masked tx for phase 1, wrapped param tree for phase 2) match the
        # checkpointed opt_state structure
        self._joint_phase = self._loaded_phase == 2
        self._freeze_body = self._loaded_phase == 1

    def save_checkpoint(self, name: str):
        # joint phase: distillation gradients update the PREVIOUS heads inside
        # state.params — sync them into the head registry so mid-phase
        # checkpoints (model_latest/model_best) are complete and resumable
        if self._joint_phase and self.state is not None \
                and isinstance(self.state.params, dict) \
                and "prev_heads" in self.state.params:
            for t, head in self.state.params["prev_heads"].items():
                self.mh.heads[t] = dict(head)
        super().save_checkpoint(name)

    # -------------------------------------------------- param tree wrapping
    def _wrap_params(self, assembled):
        if not self._joint_phase:
            return assembled
        prev = {t: dict(self.mh.heads[t]) for t in self.mh.tasks[:-1]}
        return {"main": assembled, "prev_heads": prev}

    def _unwrap_params(self, step_params):
        if not self._joint_phase or "main" not in step_params:
            return step_params
        return step_params["main"]

    # -------------------------------------------------- two-phase training
    def train_task(self, task: str, stage_dir: str, num_epochs: int | None = None,
                   start_epoch: int = 0):
        first = self.mh is None
        # a restored trainer resuming the FIRST task mid-task is also "first":
        # the manifest phase is 0 (plain training) and the task is the only one
        if not first and start_epoch and getattr(self, "_loaded_phase", 0) == 0 \
                and list(self.mh.tasks) == [task]:
            first = True
        if first:
            self._joint_phase = False
            super().train_task(task, stage_dir, num_epochs, start_epoch=start_epoch)
            return
        # mid-task resume: the checkpoint manifest records which phase the
        # model_latest belongs to (see extra_manifest), so `-c` re-enters that
        # phase at the right epoch instead of restarting both phases
        resume_phase = int(getattr(self, "_loaded_phase", 0)) if start_epoch else 0
        if resume_phase == 2:
            self.register_task_data(task, stage_dir)
            self._freeze_body = False
            self._joint_phase = True
            self._skip_before_ckpt = True
            if not isinstance(self.cl_state.get("old_models"), dict):
                # cl_state lost (e.g. checkpoint saved without it): rebuild
                # teachers from the restored previous heads — equivalent as
                # long as the joint phase just started; log either way
                self.logger(f"[{task}] LwF resume: rebuilding teacher snapshots "
                            "from restored heads")
                self.cl_state = {"old_models": {t: self.mh.assemble(t)
                                                for t in self.mh.tasks[:-1]}}
            self.logger(f"[{task}] LwF resume: joint phase from epoch {start_epoch}")
            super().train_task(task, stage_dir, num_epochs,
                               start_epoch=start_epoch)
            self._joint_phase = False
            self._skip_before_ckpt = False
            return
        # Phase 1: freeze body, train the new head plain (freeze_run)
        self.register_task_data(task, stage_dir)
        if task not in self.mh.tasks:
            self.mh = self.mh.add_new_task(task, use_init=True)
        self._joint_phase = False
        self._freeze_body = True
        self._suppress_finalize = True
        fe = self.freeze_epochs if self.freeze_epochs is not None else (
            num_epochs or self.opts.num_epochs)
        if resume_phase == 1:
            self.logger(f"[{task}] LwF resume: freeze phase from epoch {start_epoch}")
        self.logger(f"[{task}] LwF phase 1: frozen-body head training ({fe} epochs)")
        super().train_task(task, stage_dir, num_epochs=fe,
                           start_epoch=start_epoch if resume_phase == 1 else 0)
        self._suppress_finalize = False
        self.save_checkpoint("model_freezed")
        self._skip_before_ckpt = True  # phase 2 must not overwrite before_training
        # Phase 2: snapshot old models, joint training with distillation
        self._freeze_body = False
        self._joint_phase = True
        self.cl_state = {"old_models": {t: self.mh.assemble(t)
                                        for t in self.mh.tasks[:-1]}}
        self.logger(f"[{task}] LwF phase 2: joint training with distillation "
                    f"over {len(self.cl_state['old_models'])} previous heads")
        super().train_task(task, stage_dir, num_epochs)
        # write trained prev heads back into the registry
        self._joint_phase = False
        self._skip_before_ckpt = False

    def trainable_mask(self):
        if getattr(self, "_freeze_body", False):
            return self.mh.trainable_mask(freeze_body=True)
        return None

    # -------------------------------------------------- custom joint step
    def _build_step(self):
        if not self._joint_phase:
            super()._build_step()
            return
        from ..optimizer import make_optimizer
        self.tx = make_optimizer(
            max_epochs=self.opts.num_epochs,
            iters_per_epoch=self.opts.iters_per_epoch,
            initial_lr=self.opts.initial_lr)
        model = self.model
        dsf, batch_dice = self.ds_factors, self.batch_dice
        nc = self.num_classes
        temp = self.lwf_temperature
        aug = AugmentConfig() if self.opts.augment else None
        prev_tasks = self.mh.tasks[:-1]
        tx = self.tx

        def loss_fn(params, cl_state, data, seg):
            outputs = model.apply({"params": params["main"]}, data)
            base = deep_supervision_loss(outputs, seg, dsf, batch_dice)
            main_flat = flatten(params["main"])
            cur_logits, tgt_logits = [], []
            for t in prev_tasks:
                merged = dict(main_flat)
                merged.update(params["prev_heads"][t])
                out_t = model.apply({"params": unflatten(merged)}, data)[0]
                old_out = model.apply({"params": cl_state["old_models"][t]}, data)[0]
                cur_logits.append(out_t)
                tgt_logits.append(jax.lax.stop_gradient(old_out))
            dist = lwf_distill_loss(cur_logits, tgt_logits, temp)
            return base + dist, (outputs, {"lwf_distill": dist})

        @jax.jit
        def train_step(state, cl_state, batch, rng):
            data, seg = batch["data"], batch["seg"]
            if aug is not None:
                keys = jax.random.split(rng, data.shape[0])
                data, seg = jax.vmap(lambda k, d, s: _augment_one(k, d, s, aug))(
                    keys, data, seg)
            seg = seg.astype(jnp.int32)
            (loss, (outputs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, cl_state, data, seg)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            tp, fp, fn = online_eval_counts(outputs[0], seg, nc)
            metrics = {"loss": loss, "tp": tp, "fp": fp, "fn": fn, **aux}
            return TrainState(params=params, opt_state=opt_state,
                              step=state.step + 1), cl_state, metrics

        self._train_step = train_step
        from ..train_step import StepConfig, make_eval_step
        self._eval_step = make_eval_step(model, StepConfig(
            ds_factors=dsf, batch_dice=batch_dice, num_classes=nc, augment=None))
        params = self._setup_spmd(self._wrap_params(self.mh.assemble()))
        self.state = TrainState.create(params, self.tx)
        # mid-phase resume: adopt restored params + optimizer momentum
        self._adopt_resume_state()

    def after_task(self, task: str):
        # absorb trained previous heads from the joint phase back into heads
        if self._joint_phase and self.state is not None and "prev_heads" in self.state.params:
            for t, head in self.state.params["prev_heads"].items():
                self.mh.heads[t] = dict(head)
