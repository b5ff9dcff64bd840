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


class BaseUNetTrainer(SequentialTrainer):
    """Plain single-task trainer — the stand-in for upstream
    ``nnUNetTrainerV2`` base models (the reference evaluates and init-seeds
    from these via a special path, ``run/default_configuration.py:74-75``,
    ``evaluation/evaluator.py:149-190``).  Structurally a one-task
    SequentialTrainer; its checkpoints restore and evaluate cross-task like
    any other (tasks without a head fall back to the only head)."""
    EXTENSION = "base_v2"
