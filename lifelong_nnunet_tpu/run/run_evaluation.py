"""CLI: cross-task evaluation — ``nnUNet_evaluate`` / ``nnUNet_evaluate2``.

Counterpart of ``nnunet_ext/run/run_evaluation.py:19-248``: locate the
trained model in the results tree from (network, trainer, trained-on tasks,
fold, arch flags), then run either the window-based Evaluator (validation
split metrics) or evaluator2 (full inference on raw images).
"""

from __future__ import annotations

import argparse
import os

from .. import paths
from ..evaluation.evaluator import Evaluator
from ..evaluation.evaluator2 import run_evaluation2
from ..training.output_paths import arch_dir, build_output_folder
from ..training.restore import find_checkpoint
from .plan_and_preprocess import resolve_task
from .run_training import _camel, stage_dir_for


def build_parser(two: bool) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("network", choices=["2d", "3d_lowres", "3d_fullres"])
    p.add_argument("trainer", help="extension name or nnUNetTrainer* class name")
    p.add_argument("-trained_on", nargs="+", required=True,
                   help="task sequence the model was trained on (order matters)")
    p.add_argument("-use_model", "--use", nargs="+", default=None,
                   help="prefix of trained_on identifying which task-stage model to load")
    p.add_argument("-evaluate_on", nargs="+", required=True,
                   help="tasks to evaluate on")
    p.add_argument("-f", "--folds", nargs="+", type=int, default=[0])
    p.add_argument("-use_head", default=None)
    p.add_argument("--always_use_last_head", action="store_true")
    p.add_argument("-p", "--plans_identifier", default=paths.default_plans_identifier)
    p.add_argument("--no_transfer_heads", action="store_true")
    p.add_argument("--use_vit", action="store_true")
    p.add_argument("-v", "--vit_version", type=int, default=1)
    p.add_argument("-v_type", "--vit_type", default="base")
    p.add_argument("--task_specific_ln", action="store_true")
    p.add_argument("--do_LSA", action="store_true")
    p.add_argument("--do_SPT", action="store_true")
    if two:
        p.add_argument("-chk", default="model_final_checkpoint")
        p.add_argument("--no_delete", action="store_true")
        p.add_argument("--disable_tta", action="store_true")
        p.add_argument("--evaluate_initialization", action="store_true",
                       help="evaluate the 'before_training' checkpoint")
        p.add_argument("--legacy_structure", action="store_true",
                       help="reference legacy output tree: one merged "
                            "val_metrics_*.{json,csv} + summarized txt instead "
                            "of per-task subfolders (evaluator2.py:185-240)")
    return p


def _resolve_task_args(args):
    """Resolve numeric task ids (reference CLI convention, e.g. ``-trained_on
    97 98``) to full ``TaskXXX_Name`` names against the preprocessed root
    (falling back to raw), in place."""
    roots = [paths.preprocessed_dir(create=False), paths.raw_data_dir(create=False)]

    def resolve(t):
        for root in roots:
            if root and os.path.isdir(root):
                try:
                    return os.path.basename(resolve_task(t, root))
                except (FileNotFoundError, ValueError):
                    continue
        return t

    args.trained_on = [resolve(t) for t in args.trained_on]
    if args.use:
        args.use = [resolve(t) for t in args.use]


BASE_TRAINERS = {"nnUNetTrainerV2": False, "base_v2": False,
                 "nnViTUNetTrainer": True, "vit_unet": True}


def _locate_model(args, results, fold):
    from ..training.trainers import get_trainer
    trainer_cls = get_trainer(args.trainer)
    if args.trainer in BASE_TRAINERS:
        # plain single-task base models live in the nnU-Net-style tree
        # results/<network>/<task>/<Trainer>__<plans>/<arch>/fold_X
        # (reference wraps these for cross-task eval, evaluator.py:149-190)
        is_vit = BASE_TRAINERS[args.trainer]
        name = "nnViTUNetTrainer" if is_vit else "nnUNetTrainerV2"
        task = (args.use or args.trained_on)[-1]
        folder = os.path.join(
            results, args.network, task, f"{name}__{args.plans_identifier}",
            arch_dir(vit=is_vit, vit_version=f"V{args.vit_version}",
                     vit_type=args.vit_type, spt=args.do_SPT, lsa=args.do_LSA),
            f"fold_{fold}")
        ckpt = find_checkpoint(folder)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint in {folder}")
        return ckpt
    trainer_name = args.trainer if args.trainer.startswith("nnUNetTrainer") \
        else f"nnUNetTrainer{_camel(args.trainer)}"
    transfer = trainer_cls.TRANSFER_HEADS and not args.no_transfer_heads
    use = args.use or args.trained_on
    arch_kwargs = dict(vit=args.use_vit, vit_version=f"V{args.vit_version}",
                       vit_type=args.vit_type,
                       task_specific_ln=args.task_specific_ln,
                       spt=args.do_SPT, lsa=args.do_LSA)
    folder = build_output_folder(results, args.network, args.trained_on, use,
                                 trainer_name, args.plans_identifier, fold,
                                 transfer, **arch_kwargs)
    ckpt = find_checkpoint(folder)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {folder}")
    return ckpt


def run_evaluation(argv=None):
    args = build_parser(two=False).parse_args(argv)
    results = paths.require(paths.results_dir(create=False), "results")
    eval_root = paths.require(paths.evaluation_dir(), "evaluation")
    pre = paths.require(paths.preprocessed_dir(create=False), "preprocessed data")
    _resolve_task_args(args)
    for fold in args.folds:
        ckpt = _locate_model(args, results, fold)
        ev = Evaluator(ckpt)
        stages = {}
        for t in args.evaluate_on:
            name = os.path.basename(resolve_task(t, pre))
            stages[name] = stage_dir_for(pre, name, args.network)
        out = os.path.join(eval_root, os.path.relpath(os.path.dirname(ckpt), results))
        res = ev.evaluate_on(stages, out, use_head=args.use_head,
                             always_use_last_head=args.always_use_last_head)
        print(f"[fold {fold}] evaluation written to {out}")
    return 0


def run_evaluation2_cli(argv=None):
    args = build_parser(two=True).parse_args(argv)
    results = paths.require(paths.results_dir(create=False), "results")
    eval_root = paths.require(paths.evaluation_dir(), "evaluation")
    raw = paths.require(paths.raw_data_dir(create=False), "raw data")
    _resolve_task_args(args)
    for fold in args.folds:
        folder_ckpt = _locate_model(args, results, fold)
        chk = "before_training" if args.evaluate_initialization else args.chk
        base = os.path.join(os.path.dirname(folder_ckpt), chk)
        if not os.path.isfile(base + ".ckpt"):
            base = folder_ckpt
        raw_dirs = {os.path.basename(resolve_task(t, raw)): resolve_task(t, raw)
                    for t in args.evaluate_on}
        out = os.path.join(eval_root,
                           os.path.relpath(os.path.dirname(folder_ckpt), results),
                           "eval2")
        run_evaluation2(base, raw_dirs, out, use_head=args.use_head,
                        do_tta=not args.disable_tta, no_delete=args.no_delete,
                        fold=fold, legacy_structure=args.legacy_structure)
        print(f"[fold {fold}] evaluation2 written to {out}")
    return 0


def main():
    return run_evaluation()


def main2():
    return run_evaluation2_cli()


if __name__ == "__main__":
    main()
