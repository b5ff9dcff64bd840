"""Cascade support: 3d_lowres → 3d_fullres second stage.

Counterpart of the upstream cascade pipeline the reference's
``nnViTUNetTrainer_CascadeFullRes`` builds on: the low-resolution stage's
predicted segmentation is upsampled to full resolution, one-hot encoded over
the foreground classes, and appended to the full-res cases as extra input
channels (``prepare_cascade_stage``).  ``CascadeFullResTrainer`` then trains
the full-res model with ``num_modalities + num_fg_classes`` inputs.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
from scipy import ndimage

from ..data.dataset import PreprocessedDataset
from ..training.restore import restore_trainer
from ..training.trainers.sequential import SequentialTrainer
from .sliding_window import predict_sliding_window


def prepare_cascade_stage(lowres_ckpt_base: str, lowres_stage_dir: str,
                          fullres_stage_dir: str, out_stage_dir: str,
                          window_batch: int = 8, do_tta: bool = False) -> list:
    """Run the lowres model over every preprocessed lowres case, upsample the
    predicted segmentation to the matching fullres case's grid, and write
    augmented cases (``[C + num_fg, X, Y, Z]`` + seg) into ``out_stage_dir``."""
    trainer = restore_trainer(lowres_ckpt_base)
    model = trainer.model
    apply_fn = lambda p, x: model.apply({"params": p}, x)
    params = trainer.mh.assemble()
    num_classes = trainer.num_classes
    low = PreprocessedDataset(lowres_stage_dir)
    full = PreprocessedDataset(fullres_stage_dir)
    os.makedirs(out_stage_dir, exist_ok=True)
    written = []
    for case in full.cases:
        if case not in low.cases:
            continue
        low_arr = np.asarray(low.load(case))
        data_low = np.moveaxis(low_arr[:-1], 0, -1)
        seg_pred = predict_sliding_window(
            apply_fn, params, data_low, trainer.patch_size, num_classes,
            mirror_axes=(0, 1, 2) if do_tta else (), window_batch=window_batch,
            output="seg", input_bf16=True)
        full_arr = np.asarray(full.load(case))
        full_shape = full_arr.shape[1:]
        zoom = np.array(full_shape) / np.array(seg_pred.shape)
        onehots = []
        for c in range(1, num_classes):   # foreground classes only (nnU-Net)
            m = ndimage.zoom((seg_pred == c).astype(np.float32), zoom, order=1,
                             mode="nearest")
            m = m[tuple(slice(0, s) for s in full_shape)]
            pad = [(0, s - m.shape[i]) for i, s in enumerate(full_shape)]
            m = np.pad(m, pad)
            onehots.append((m > 0.5).astype(np.float32))
        stacked = np.concatenate([full_arr[:-1], np.stack(onehots),
                                  full_arr[-1:]], axis=0).astype(np.float32)
        np.save(os.path.join(out_stage_dir, f"{case}.npy"), stacked)
        for suffix in (".props.json", ".classlocs.npz"):
            src = os.path.join(fullres_stage_dir, case + suffix)
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(out_stage_dir, case + suffix))
        written.append(case)
    return written


class CascadeFullResTrainer(SequentialTrainer):
    """Full-res cascade stage trainer: expects stage dirs produced by
    ``prepare_cascade_stage`` (modalities + one-hot prev-stage fg channels).
    Reference counterpart: nnViTUNetTrainer_CascadeFullRes."""
    EXTENSION = "cascade_fullres"

    def __init__(self, plans, config_name, output_folder, options=None, **kw):
        super().__init__(plans, config_name, output_folder, options, **kw)
        self.in_channels = plans.num_modalities + plans.num_classes
