"""Trainer registry: extension name / class name -> trainer class.

Replaces the reference's filesystem-scanning registry (``run/run_training.py:
18-29``, ``utilities/ext_map.py:3-18``) with explicit imports — the
"one trainer module per extension" convention is kept, but the map is
declared, not discovered, so it is import-safe and typo-checked."""

from ..trainer import MultiHeadTrainer
from .sequential import BaseUNetTrainer, SequentialTrainer
from .rehearsal import RehearsalTrainer
from .ewc import EWCLNTrainer, EWCTrainer, EWCUNetTrainer, EWCViTTrainer
from .rw import RWTrainer
from .lwf import LwFTrainer
from .mib import MiBTrainer
from .plop import PLOPTrainer, PODTrainer
from .frozen import (FrozEWCTrainer, FrozenBodyTrainer, FrozenNonLNTrainer,
                     FrozenUNetTrainer, FrozenViTTrainer)
from .own import OwnM1Trainer, OwnM2Trainer, OwnM3Trainer, OwnM4Trainer

TRAINER_MAP = {
    "multihead": MultiHeadTrainer,
    "sequential": SequentialTrainer,
    "base_v2": BaseUNetTrainer,
    "rehearsal": RehearsalTrainer,
    "ewc": EWCTrainer,
    "ewc_vit": EWCViTTrainer,
    "ewc_unet": EWCUNetTrainer,
    "ewc_ln": EWCLNTrainer,
    "rw": RWTrainer,
    "lwf": LwFTrainer,
    "mib": MiBTrainer,
    "plop": PLOPTrainer,
    "pod": PODTrainer,
    "frozen_vit": FrozenViTTrainer,
    "frozen_nonln": FrozenNonLNTrainer,
    "frozen_unet": FrozenUNetTrainer,
    "frozen_body_seq": FrozenBodyTrainer,
    "froz_ewc": FrozEWCTrainer,
    "ownm1": OwnM1Trainer,
    "ownm2": OwnM2Trainer,
    "ownm3": OwnM3Trainer,
    "ownm4": OwnM4Trainer,
}

# reference class names -> ours, for CLI/checkpoint compatibility
CLASS_NAME_MAP = {
    "nnUNetTrainerV2": BaseUNetTrainer,
    "nnUNetTrainerMultiHead": MultiHeadTrainer,
    "nnUNetTrainerSequential": SequentialTrainer,
    "nnUNetTrainerRehearsal": RehearsalTrainer,
    "nnUNetTrainerEWC": EWCTrainer,
    "nnUNetTrainerEWCViT": EWCViTTrainer,
    "nnUNetTrainerEWCUNet": EWCUNetTrainer,
    "nnUNetTrainerEWCLN": EWCLNTrainer,
    "nnUNetTrainerRW": RWTrainer,
    "nnUNetTrainerLWF": LwFTrainer,
    "nnUNetTrainerMiB": MiBTrainer,
    "nnUNetTrainerPLOP": PLOPTrainer,
    "nnUNetTrainerPOD": PODTrainer,
    "nnUNetTrainerFrozenViT": FrozenViTTrainer,
    "nnUNetTrainerFrozenNonLN": FrozenNonLNTrainer,
    "nnUNetTrainerFrozenUNet": FrozenUNetTrainer,
    "nnUNetTrainerFrozenBody": FrozenBodyTrainer,
    "nnUNetTrainerFrozEWC": FrozEWCTrainer,
    "nnUNetTrainerOwnM1": OwnM1Trainer,
    "nnUNetTrainerOwnM2": OwnM2Trainer,
    "nnUNetTrainerOwnM3": OwnM3Trainer,
    "nnUNetTrainerOwnM4": OwnM4Trainer,
}


def get_trainer(name: str):
    # late registrations (import cycles: these modules import this registry)
    if name in ("cascade_fullres", "CascadeFullResTrainer",
                "nnViTUNetTrainer_CascadeFullRes"):
        from ...inference.cascade import CascadeFullResTrainer
        return CascadeFullResTrainer
    if name in ("vit_unet", "ViTUNetTrainer", "nnViTUNetTrainer"):
        from ...run.run_training_vit import ViTUNetTrainer
        return ViTUNetTrainer
    if name in TRAINER_MAP:
        return TRAINER_MAP[name]
    if name in CLASS_NAME_MAP:
        return CLASS_NAME_MAP[name]
    raise KeyError(f"unknown trainer/extension {name!r}; known: {sorted(TRAINER_MAP)}")
