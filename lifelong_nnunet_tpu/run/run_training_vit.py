"""CLI: single-task ViT U-Net training — ``nnUNet_train_vit``.

Counterpart of ``nnunet_ext/run/run_training_vit.py`` (the launcher for the
non-CL ``nnViTUNetTrainer``, reference ``nnViTUNetTrainer.py:18-138``):
nnU-Net-style positional (network, task, fold) arguments, one task, the
Generic_ViT_UNet backbone.  The reference's ``split_gpu`` 2-GPU placement
(``:134-137``) is replaced by mesh sharding (SURVEY.md §2.7).
"""

from __future__ import annotations

import argparse
import os

from .. import paths
from ..planning.plans import Plans, plans_path
from ..training.output_paths import arch_dir
from ..training.trainer import TrainerOptions
from ..training.trainers.sequential import SequentialTrainer
from .plan_and_preprocess import resolve_task
from .run_training import stage_dir_for


class ViTUNetTrainer(SequentialTrainer):
    """Single-task trainer for Generic_ViT_UNet (reference nnViTUNetTrainer)."""
    EXTENSION = "vit_unet"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("network", choices=["2d", "3d_lowres", "3d_fullres"])
    p.add_argument("task")
    p.add_argument("fold", type=int)
    p.add_argument("-trainer_class", default="nnViTUNetTrainer",
                   choices=["nnViTUNetTrainer", "nnUNetTrainerV2"],
                   help="nnUNetTrainerV2 trains a plain single-task U-Net base "
                        "model (upstream nnUNet_train stand-in) usable with "
                        "--init_seq and cross-task evaluation")
    p.add_argument("-num_epochs", type=int, default=100)
    p.add_argument("-num_iters", type=int, default=250)
    p.add_argument("-val_iters", type=int, default=50)
    p.add_argument("-save_interval", type=int, default=25)
    p.add_argument("-v", "--vit_version", type=int, default=1, choices=[1, 2, 3, 4])
    p.add_argument("-v_type", "--vit_type", default="base",
                   choices=["base", "large", "huge"])
    p.add_argument("--do_LSA", action="store_true")
    p.add_argument("--do_SPT", action="store_true")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("-p", "--plans_identifier", default=paths.default_plans_identifier)
    p.add_argument("-patch_size", nargs="+", type=int, default=None)
    p.add_argument("-batch_size", type=int, default=None)
    p.add_argument("-base_features", type=int, default=None)
    p.add_argument("-max_features", type=int, default=None)
    p.add_argument("-vit_depth", type=int, default=None)
    p.add_argument("--no_augment", action="store_true")
    args = p.parse_args(argv)

    pre = paths.require(paths.preprocessed_dir(create=False), "preprocessed data")
    results = paths.require(paths.results_dir(), "results")
    task = os.path.basename(resolve_task(args.task, pre))
    plans = Plans.load(plans_path(os.path.join(pre, task), args.plans_identifier))
    use_vit = args.trainer_class == "nnViTUNetTrainer"
    opts = TrainerOptions(
        num_epochs=args.num_epochs, iters_per_epoch=args.num_iters,
        val_iters=args.val_iters, save_every=args.save_interval, fold=args.fold,
        dtype="float32" if args.fp32 else "bfloat16",
        patch_size=tuple(args.patch_size) if args.patch_size else None,
        batch_size=args.batch_size, augment=not args.no_augment,
        base_num_features=args.base_features, max_num_features=args.max_features,
        use_vit=use_vit, vit_version=f"V{args.vit_version}", vit_type=args.vit_type,
        vit_lsa=args.do_LSA, vit_spt=args.do_SPT,
        vit_depth_override=args.vit_depth)
    out = os.path.join(
        results, args.network, task, f"{args.trainer_class}__{args.plans_identifier}",
        arch_dir(vit=use_vit, vit_version=f"V{args.vit_version}",
                 vit_type=args.vit_type, spt=args.do_SPT, lsa=args.do_LSA),
        f"fold_{args.fold}")
    if use_vit:
        trainer = ViTUNetTrainer(plans, args.network, out, opts)
    else:
        from ..training.trainers.sequential import BaseUNetTrainer
        trainer = BaseUNetTrainer(plans, args.network, out, opts)
    trainer.train_task(task, stage_dir_for(pre, task, args.network))
    print(f"finished {task} -> {out}")
    return 0


if __name__ == "__main__":
    main()
