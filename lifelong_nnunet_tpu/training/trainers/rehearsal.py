"""Rehearsal trainer (experience replay).

Reference: ``nnunet_ext/training/network_training/rehearsal/
nnUNetTrainerRehearsal.py:65-173`` — the training pool for task t fuses
``samples_in_perc`` (default 0.25) of EVERY previous task's train split
(seeded ``random.sample`` with seed 3299, ``:132``); validation stays
current-task only.  Heads transfer (Sequential-style).
"""

from __future__ import annotations

import numpy as np

from ...data.sampler import PatchSampler
from ..trainer import MultiHeadTrainer

REHEARSAL_SEED = 3299  # reference run_training.py:164


class RehearsalTrainer(MultiHeadTrainer):
    EXTENSION = "rehearsal"
    TRANSFER_HEADS = True
    HYPERPARAMS = {"samples_in_perc": float, "seed": int}

    def __init__(self, *args, samples_in_perc: float = 0.25,
                 rehearsal_seed: int = REHEARSAL_SEED, **kw):
        kw.setdefault("samples_in_perc", samples_in_perc)
        super().__init__(*args, **kw)
        self.samples_in_perc = float(samples_in_perc)
        self.rehearsal_seed = int(rehearsal_seed)

    def _make_sampler(self, task: str, train: bool = True, seed_offset: int = 0):
        if not train:
            return super()._make_sampler(task, train, seed_offset)
        ds, tr, _ = self._datasets[task]
        pool = [(ds, c) for c in tr]
        rng = np.random.RandomState(self.rehearsal_seed)
        for prev, (pds, ptr, _pval) in self._datasets.items():
            if prev == task:
                continue
            n = max(1, int(round(self.samples_in_perc * len(ptr))))
            chosen = rng.choice(len(ptr), size=min(n, len(ptr)), replace=False)
            pool += [(pds, ptr[i]) for i in chosen]
        from ...data.sampler import input_shard
        return PatchSampler(None, pool, self.patch_size, self.batch_size,
                            oversample_foreground_percent=self.opts.oversample,
                            seed=self.opts.seed + seed_offset,
                            shard=input_shard())
