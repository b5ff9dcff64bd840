"""Trainer registry: extension name / class name -> trainer class.

Replaces the reference's filesystem-scanning registry (``run/run_training.py:
18-29``, ``utilities/ext_map.py:3-18``) with explicit imports — the
"one trainer module per extension" convention is kept, but the map is
declared, not discovered, so it is import-safe and typo-checked."""

from ..trainer import MultiHeadTrainer
from .sequential import SequentialTrainer
from .rehearsal import RehearsalTrainer

TRAINER_MAP = {
    "multihead": MultiHeadTrainer,
    "sequential": SequentialTrainer,
    "rehearsal": RehearsalTrainer,
}

# reference class names -> ours, for CLI/checkpoint compatibility
CLASS_NAME_MAP = {
    "nnUNetTrainerMultiHead": MultiHeadTrainer,
    "nnUNetTrainerSequential": SequentialTrainer,
    "nnUNetTrainerRehearsal": RehearsalTrainer,
}


def get_trainer(name: str):
    if name in TRAINER_MAP:
        return TRAINER_MAP[name]
    if name in CLASS_NAME_MAP:
        return CLASS_NAME_MAP[name]
    raise KeyError(f"unknown trainer/extension {name!r}; known: {sorted(TRAINER_MAP)}")
