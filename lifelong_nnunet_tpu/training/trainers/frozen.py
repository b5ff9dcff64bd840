"""Frozen-* ablation trainers.

Reference (SURVEY.md §2.4):
  * frozen_vit  (``frozen_vit/…:29-67``):   Sequential; whole ViT frozen after task 1
  * frozen_nonln (``frozen_nonln/…``):       freeze everything EXCEPT ViT LayerNorms
  * frozen_unet (``frozen_unet/…``):         freeze everything EXCEPT the ViT
  * frozen_body (``frozen_body_seq/…:225-246``, registered as
    nnUNetTrainerFrozenBody): Sequential with the whole shared body frozen
    after the first task; only the head trains
  * froz_ewc    (``froz_ewc/…``):            EWC + ViT frozen on every 2nd task;
    ``--adaptive`` scales λ by exp(-1/3) during frozen tasks (``:107``)

The reference flips ``requires_grad`` and rebuilds the optimizer; here each
variant is a boolean trainable mask fed to ``optax.masked`` — the optimizer is
rebuilt per task anyway.
"""

from __future__ import annotations

import math

from ...models.multihead import flatten, name_filter_mask, unflatten
from .ewc import EWCTrainer
from .sequential import SequentialTrainer


class _FilterFrozenMixin:
    """Freeze params matching (or complementing) a name filter after task 1."""
    FREEZE_FILTER: tuple = ((), True)   # (substrings, freeze_matching)

    def _past_first_task(self) -> bool:
        fold = self.already_trained_on.get(str(self.opts.fold), {})
        return self.mh is not None and (
            len(self.mh.tasks) > 1 or bool(fold.get("finished_training_on")))

    def trainable_mask(self):
        if not self._past_first_task():
            return None
        subs, freeze_matching = self.FREEZE_FILTER
        params = self.mh.assemble()
        frozen = flatten(name_filter_mask(params, list(subs), include=freeze_matching))
        return unflatten({k: not v for k, v in frozen.items()})


class FrozenViTTrainer(_FilterFrozenMixin, SequentialTrainer):
    EXTENSION = "frozen_vit"
    FREEZE_FILTER = (["vit"], True)           # freeze the ViT


class FrozenNonLNTrainer(_FilterFrozenMixin, SequentialTrainer):
    EXTENSION = "frozen_nonln"
    FREEZE_FILTER = (["vit", "norm"], False)  # freeze all but ViT LayerNorms


class FrozenUNetTrainer(_FilterFrozenMixin, SequentialTrainer):
    EXTENSION = "frozen_unet"
    FREEZE_FILTER = (["vit"], False)          # freeze all but the ViT


class FrozenBodyTrainer(SequentialTrainer):
    """Whole body frozen after the first task; head trains per task
    (reference frozen_body_seq, class nnUNetTrainerFrozenBody)."""
    EXTENSION = "frozen_body_seq"

    def trainable_mask(self):
        fold = self.already_trained_on.get(str(self.opts.fold), {})
        past_first = self.mh is not None and (
            len(self.mh.tasks) > 1 or bool(fold.get("finished_training_on")))
        if not past_first:
            return None
        return self.mh.trainable_mask(freeze_body=True)


class FrozEWCTrainer(EWCTrainer):
    """EWC with the ViT frozen on every SECOND task; ``adaptive`` shrinks the
    EWC λ by exp(-1/3) while frozen (reference froz_ewc/…:36-48,107)."""
    EXTENSION = "froz_ewc"
    HYPERPARAMS = {"ewc_lambda": float, "adaptive": bool}

    def __init__(self, *args, adaptive: bool = False, **kw):
        kw.setdefault("adaptive", adaptive)
        super().__init__(*args, **kw)
        self.adaptive = bool(adaptive)
        self._base_lambda = self.ewc_lambda

    def _task_index(self) -> int:
        return 0 if self.mh is None else len(self.mh.tasks) - 1

    def _vit_frozen_now(self) -> bool:
        # frozen on every 2nd task (task indices 1, 3, 5, ... 0-based)
        return self._task_index() % 2 == 1

    def before_task(self, task: str):
        super().before_task(task)
        frozen = self._vit_frozen_now()
        self.ewc_lambda = (self._base_lambda * math.exp(-1.0 / 3.0)
                           if (self.adaptive and frozen) else self._base_lambda)
        if frozen:
            self.logger(f"[{task}] froz_ewc: ViT frozen this task"
                        + (f", lambda -> {self.ewc_lambda:.4f}" if self.adaptive else ""))

    def trainable_mask(self):
        if not self._vit_frozen_now():
            return None
        params = self.mh.assemble()
        vit = flatten(name_filter_mask(params, ["vit"], include=True))
        return unflatten({k: not v for k, v in vit.items()})
