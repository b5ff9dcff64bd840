"""CLI: prediction on a folder of images — ``nnUNet_inference``.

Counterpart of ``nnunet_ext/run/run_inference.py:216-301``: locate the
trained model exactly like the evaluator does, pick a head, and run
``predict_from_folder`` (preprocess → sliding window + TTA → resample back →
NIfTI export, optional largest-component postprocessing).
"""

from __future__ import annotations

import argparse
import os

from .. import paths
from ..inference.predict import predict_from_folder
from ..training.restore import restore_trainer
from .run_evaluation import _locate_model, _resolve_task_args


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("network", choices=["2d", "3d_lowres", "3d_fullres"])
    p.add_argument("trainer")
    p.add_argument("-i", "--input_folder", required=True)
    p.add_argument("-o", "--output_folder", required=True)
    p.add_argument("-trained_on", nargs="+", required=True)
    p.add_argument("-use_model", "--use", nargs="+", default=None)
    p.add_argument("-f", "--folds", nargs="+", type=int, default=[0],
                   help="folds to ensemble (softmax-averaged)")
    p.add_argument("-use_head", default=None)
    p.add_argument("-chk", default="model_final_checkpoint")
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--postprocess", action="store_true",
                   help="largest-connected-component per class")
    p.add_argument("-p", "--plans_identifier", default=paths.default_plans_identifier)
    p.add_argument("--no_transfer_heads", action="store_true")
    p.add_argument("--use_vit", action="store_true")
    p.add_argument("-v", "--vit_version", type=int, default=1)
    p.add_argument("-v_type", "--vit_type", default="base")
    p.add_argument("--task_specific_ln", action="store_true")
    p.add_argument("--do_LSA", action="store_true")
    p.add_argument("--do_SPT", action="store_true")
    p.add_argument("-window_batch", type=int, default=8)
    return p


def run_inference(argv=None):
    args = build_parser().parse_args(argv)
    # numeric task ids resolve to TaskXXX_Name exactly like the evaluator CLI
    _resolve_task_args(args)
    results = paths.require(paths.results_dir(create=False), "results")
    params_per_fold, trainer = [], None
    for fold in args.folds:
        ckpt = _locate_model(args, results, fold)
        base = os.path.join(os.path.dirname(ckpt), args.chk)
        if not os.path.isfile(base + ".ckpt"):
            base = ckpt
        trainer = restore_trainer(base)
        head = args.use_head or trainer.mh.tasks[-1]
        params_per_fold.append(trainer.mh.assemble(head))
    from ..models.unet import maybe_pallas_conv
    model = maybe_pallas_conv(trainer.model)
    apply_fn = lambda p, x: model.apply({"params": p}, x)
    post = None
    if args.postprocess:
        from ..inference.postprocessing import load_postprocessing
        post = load_postprocessing(os.path.dirname(base)) or trainer.plans.all_classes
    written = predict_from_folder(
        apply_fn, params_per_fold, trainer.plans, trainer.config_name,
        args.input_folder, args.output_folder,
        do_tta=not args.disable_tta, window_batch=args.window_batch,
        postprocess_labels=post)
    print(f"wrote {len(written)} segmentations to {args.output_folder} (head {head})")
    return 0


def main():
    return run_inference()


if __name__ == "__main__":
    main()
