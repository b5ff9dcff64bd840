"""Lifelong-nnUNet-TPU: a TPU-native continual-learning medical segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MECLabTUDA/Lifelong-nnUNet (reference: /root/reference): nnU-Net-style
planning/preprocessing, a plans-driven 2D/3D U-Net (+ ViT-augmented variant),
a generic multi-head (shared body / per-task head) parameter partitioning,
~20 continual-learning trainers (Sequential, Multi-Head, Rehearsal, EWC
variants, RW, LwF, MiB, PLOP, POD, frozen-* ablations, OwnM1-4), Gaussian
sliding-window inference, cross-task evaluation with Dice/IoU/BWT/FWT, and a
hyperparameter-search harness.

Design notes (TPU-first, not a port):
  * Models are pure functions over parameter pytrees (flax.linen); the
    reference's mutable nn.Module surgery (MultiHead_Module split/assemble)
    becomes a zero-cost dict partition (`models/multihead.py`).
  * Every trainer is one jitted `train_step`; CL methods differ only in a
    composable loss term + a `cl_state` pytree (fisher, teacher params,
    thresholds, logits) that never leaves HBM (`ops/cl_losses.py`).
  * Scale-out is SPMD over a `jax.sharding.Mesh` (data + spatial/tensor
    axes); the reference's manual 2-GPU placements map to sharding
    annotations (`parallel/mesh.py`).
"""

__version__ = "0.1.0"
