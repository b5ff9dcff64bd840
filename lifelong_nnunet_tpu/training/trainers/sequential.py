"""Sequential trainer (transfer learning / fine-tuning baseline).

Reference: ``nnunet_ext/training/network_training/sequential/
nnUNetTrainerSequential.py:19-155`` — forces ``transfer_heads=True`` so every
new task's head starts from the previous task's trained head, and the body
keeps training.  No CL regularization; this is the forgetting lower bound.
"""

from ..trainer import MultiHeadTrainer


class SequentialTrainer(MultiHeadTrainer):
    EXTENSION = "sequential"
    TRANSFER_HEADS = True
    HYPERPARAMS: dict = {}
