"""CLI: prepare the cascade second stage — ``nnUNet_prepare_cascade``.

Counterpart of upstream nnU-Net's predict-next-stage step: run a trained
3d_lowres model over its preprocessed cases and write fullres cases augmented
with the upsampled one-hot predictions (see inference/cascade.py), ready for
``nnUNet_train_*`` with the cascade trainer.
"""

from __future__ import annotations

import argparse
import os

from .. import paths
from ..inference.cascade import prepare_cascade_stage
from .plan_and_preprocess import resolve_task
from .run_training import stage_dir_for


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-t", "--task_id", required=True)
    p.add_argument("-ckpt", required=True,
                   help="checkpoint base of the trained 3d_lowres model "
                        "(path without extension)")
    p.add_argument("-lowres_config", default="3d_lowres")
    p.add_argument("-fullres_config", default="3d_fullres")
    p.add_argument("--tta", action="store_true")
    args = p.parse_args(argv)
    pre = paths.require(paths.preprocessed_dir(create=False), "preprocessed data")
    task = os.path.basename(resolve_task(args.task_id, pre))
    low = stage_dir_for(pre, task, args.lowres_config)
    full = stage_dir_for(pre, task, args.fullres_config)
    out = os.path.join(pre, task,
                       f"{paths.default_data_identifier}_cascade_fullres")
    written = prepare_cascade_stage(args.ckpt, low, full, out, do_tta=args.tta)
    print(f"prepared {len(written)} cascade cases -> {out}")
    return 0


if __name__ == "__main__":
    main()
