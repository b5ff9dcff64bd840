"""CLI: continual training across a task sequence — ``nnUNet_train_<method>``.

Counterpart of the reference's ``nnunet_ext/run/run_training.py:32-1006``:
one ``run_training(extension)`` behind all per-method console scripts, with
per-method hyperparameter flags, a fold × task double loop, per-task output
folders, ``-c`` continuation restore from the trained-on manifest, and
first-task initialization from a previous trainer (``--init_seq``).
"""

from __future__ import annotations

import argparse
import os
import shutil

from .. import paths
from ..planning.plans import Plans, plans_path
from ..training.output_paths import build_output_folder, metadata_folder
from ..training.restore import find_checkpoint, restore_trainer
from ..training.trainer import TrainerOptions
from ..training.trainers import TRAINER_MAP, get_trainer
from .plan_and_preprocess import resolve_task

# per-method CLI hyperparameters: flag -> (type, default) (reference
# run_training.py:163-232)
METHOD_ARGS = {
    "rehearsal": {"samples_in_perc": (float, 0.25)},
    "ewc": {"ewc_lambda": (float, 0.4)},
    "ewc_vit": {"ewc_lambda": (float, 0.4)},
    "ewc_unet": {"ewc_lambda": (float, 0.4)},
    "ewc_ln": {"ewc_lambda": (float, 0.4)},
    "froz_ewc": {"ewc_lambda": (float, 0.4), "adaptive": (bool, False)},
    "rw": {"rw_lambda": (float, 0.4), "rw_alpha": (float, 0.9),
           "fisher_update_after": (int, 10)},
    "lwf": {"lwf_temperature": (float, 2.0)},
    "mib": {"mib_alpha": (float, 0.9), "mib_lkd": (float, 10.0)},
    "plop": {"pod_lambda": (float, 1e-2), "pod_scales": (int, 3)},
    "pod": {"pod_lambda": (float, 1e-2), "pod_scales": (int, 3)},
    "ownm1": {"mib_alpha": (float, 1.0), "mib_lkd": (float, 10.0),
              "pod_lambda": (float, 1e-2), "pod_scales": (int, 3),
              "ewc_lambda": (float, 0.4)},
    "ownm2": {"mib_alpha": (float, 1.0), "mib_lkd": (float, 10.0),
              "pod_lambda": (float, 1e-2), "pod_scales": (int, 3),
              "ewc_lambda": (float, 0.4)},
    "ownm3": {"mib_alpha": (float, 1.0), "mib_lkd": (float, 10.0),
              "pod_lambda": (float, 1e-2), "pod_scales": (int, 3),
              "ewc_lambda": (float, 0.4)},
    "ownm4": {"pseudo_alpha": (float, 3.0), "pod_lambda": (float, 1e-2),
              "pod_scales": (int, 3), "ewc_lambda": (float, 0.4)},
}


def build_parser(extension: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"Continual training: {extension}")
    p.add_argument("network", choices=["2d", "3d_lowres", "3d_fullres"])
    p.add_argument("-t", "--task_ids", nargs="+", required=True,
                   help="ordered task sequence (ids or names)")
    p.add_argument("-f", "--folds", nargs="+", type=int, default=[0])
    p.add_argument("-s", "--split_at", default="seg_outputs")
    p.add_argument("-num_epochs", type=int, default=100)
    p.add_argument("-save_interval", type=int, default=25)
    p.add_argument("-p", "--plans_identifier", default=paths.default_plans_identifier)
    p.add_argument("-c", "--continue_training", action="store_true")
    p.add_argument("--init_seq", action="store_true",
                   help="initialize the first task from a previous trainer's "
                        "checkpoint (reference --init_seq, run_training.py:778-804)")
    p.add_argument("-initialize_with_network_trainer", default=None,
                   help="checkpoint base path (without extension) to initialize from")
    p.add_argument("--no_transfer_heads", action="store_true",
                   help="override a method's default head-transfer behavior")
    p.add_argument("--disable_saving", action="store_true",
                   help="delete intermediate per-task checkpoints at the end")
    p.add_argument("-val_mode", choices=["sliding_window", "patches"],
                   default="sliding_window",
                   help="periodic-validation mode: 'patches' = the "
                        "reference's patch-sampled val (metric values "
                        "comparable 1:1 with its val_metrics.json)")
    p.add_argument("--use_progress_val", action="store_true",
                   help="run cross-task validation every save_interval epochs")
    p.add_argument("--fp32", action="store_true", help="disable bfloat16 compute")
    p.add_argument("-num_iters", type=int, default=250,
                   help="train iterations per epoch (reference: 250)")
    p.add_argument("-val_iters", type=int, default=50)
    p.add_argument("--use_vit", action="store_true",
                   help="use the Generic_ViT_UNet backbone")
    p.add_argument("-v", "--vit_version", type=int, default=1, choices=[1, 2, 3, 4])
    p.add_argument("-v_type", "--vit_type", default="base",
                   choices=["base", "large", "huge"])
    p.add_argument("--task_specific_ln", action="store_true")
    p.add_argument("--do_LSA", action="store_true")
    p.add_argument("--do_SPT", action="store_true")
    p.add_argument("-d", "--device", nargs="+", default=[0],
                   help="accepted for reference-CLI compat; placement is mesh-driven")
    # small-scale overrides (tests / quick experiments); None -> plans values
    p.add_argument("-patch_size", nargs="+", type=int, default=None)
    p.add_argument("-batch_size", type=int, default=None)
    p.add_argument("-base_features", type=int, default=None)
    p.add_argument("-max_features", type=int, default=None)
    p.add_argument("-vit_depth", type=int, default=None,
                   help="shrink the ViT transformer (tests/quick experiments)")
    p.add_argument("-n_devices", type=int, default=None,
                   help="data-parallel devices (SPMD mesh; batch is sharded)")
    p.add_argument("-model_parallel", type=int, default=1,
                   help="shard conv/dense feature dims over this many of the "
                        "n_devices (mesh = data x model; replaces the "
                        "reference's --use_mult_gpus split_gpu)")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conv stages (less HBM, ~30%% more FLOPs)")
    p.add_argument("--pallas_conv", action="store_true", default=None,
                   help="fused Pallas conv+IN+LReLU for eligible low-channel "
                        "stages (TPU, bf16; ~1.35x on 128^3 CT patches). "
                        "DEFAULT-ON on TPU since round 3 (measured 1.21x CT "
                        "train step, identical loss trajectory); opt out "
                        "with --no_pallas_conv or LNN_PALLAS_CONV=0")
    p.add_argument("--no_pallas_conv", dest="pallas_conv",
                   action="store_false", help=argparse.SUPPRESS)
    for name, (typ, default) in METHOD_ARGS.get(extension, {}).items():
        if typ is bool:
            p.add_argument(f"--{name}", action="store_true", default=default)
        else:
            p.add_argument(f"-{name}", f"--{name}", type=typ, default=default)
    return p


def stage_dir_for(pre_root: str, task_name: str, config: str,
                  data_identifier: str = paths.default_data_identifier) -> str:
    d = os.path.join(pre_root, task_name, f"{data_identifier}_{config}")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"{d} missing — run nnUNet_plan_and_preprocess -t {task_name} first")
    return d


def run_training(extension: str, argv=None):
    args = build_parser(extension).parse_args(argv)
    raw = paths.raw_data_dir(create=False)
    pre = paths.require(paths.preprocessed_dir(create=False), "preprocessed data")
    results = paths.require(paths.results_dir(), "results")

    task_names = []
    for t in args.task_ids:
        try:
            task_names.append(os.path.basename(resolve_task(t, pre)))
        except FileNotFoundError:
            task_names.append(os.path.basename(resolve_task(t, raw or pre)))

    trainer_cls = get_trainer(extension)
    trainer_name = f"nnUNetTrainer{_camel(extension)}"
    first_plans = Plans.load(plans_path(os.path.join(pre, task_names[0]),
                                        args.plans_identifier))
    arch_kwargs = dict(vit=args.use_vit, vit_version=f"V{args.vit_version}",
                       vit_type=args.vit_type, task_specific_ln=args.task_specific_ln,
                       spt=args.do_SPT, lsa=args.do_LSA)
    hyper = {name: getattr(args, name) for name in METHOD_ARGS.get(extension, {})}
    transfer = trainer_cls.TRANSFER_HEADS and not args.no_transfer_heads

    for fold in args.folds:
        opts = TrainerOptions(
            num_epochs=args.num_epochs, iters_per_epoch=args.num_iters,
            val_iters=args.val_iters, save_every=args.save_interval,
            split_at=args.split_at, fold=fold,
            dtype="float32" if args.fp32 else "bfloat16",
            use_progress_val=args.use_progress_val,
            val_mode=args.val_mode,
            patch_size=tuple(args.patch_size) if args.patch_size else None,
            batch_size=args.batch_size, augment=not args.no_augment,
            base_num_features=args.base_features, max_num_features=args.max_features,
            use_vit=args.use_vit, vit_version=f"V{args.vit_version}",
            vit_type=args.vit_type, vit_lsa=args.do_LSA, vit_spt=args.do_SPT,
            vit_task_specific_ln=args.task_specific_ln,
            vit_depth_override=args.vit_depth, n_devices=args.n_devices,
            model_parallel=args.model_parallel,
            remat=args.remat, pallas_conv=args.pallas_conv)
        meta_dir = metadata_folder(results, args.network, task_names, trainer_name,
                                   args.plans_identifier, transfer, **arch_kwargs)

        trainer = None
        finished: list = []
        resume_task, resume_epoch = None, 0
        if args.continue_training:
            manifest_file = os.path.join(meta_dir, f"{extension}_trained_on.json")
            if os.path.isfile(manifest_file):
                import json
                with open(manifest_file) as f:
                    trained_on = json.load(f).get(str(fold), {})
                finished = trained_on.get("finished_training_on", [])
                in_progress = trained_on.get("start_training_on")
                # mid-task resume: a task was interrupted -> continue it from
                # model_latest (params + optimizer momentum + epoch)
                if in_progress and in_progress in task_names:
                    prog_dir = build_output_folder(
                        results, args.network, task_names,
                        task_names[: task_names.index(in_progress) + 1],
                        trainer_name, args.plans_identifier, fold, transfer,
                        **arch_kwargs)
                    ckpt = find_checkpoint(prog_dir, prefer="model_latest")
                    if ckpt and ckpt.endswith("model_latest"):
                        trainer = restore_trainer(ckpt, opts, restore_opt=True)
                        trainer.already_trained_on = {str(fold): trained_on}
                        resume_task = in_progress
                        resume_epoch = trainer.epoch + 1
                        print(f"[fold {fold}] resuming {in_progress} at epoch "
                              f"{resume_epoch} from {ckpt}")
                if trainer is None and finished:
                    last_dir = build_output_folder(
                        results, args.network, task_names,
                        task_names[: task_names.index(finished[-1]) + 1],
                        trainer_name, args.plans_identifier, fold, transfer,
                        **arch_kwargs)
                    ckpt = find_checkpoint(last_dir)
                    if ckpt:
                        trainer = restore_trainer(ckpt, opts)
                        trainer.already_trained_on = {str(fold): trained_on}
                        print(f"[fold {fold}] resumed after {finished[-1]} from {ckpt}")

        if trainer is None:
            trainer = trainer_cls(first_plans, args.network,
                                  os.path.join(meta_dir, f"fold_{fold}_bootstrap"),
                                  opts, **hyper)
            if args.init_seq and args.initialize_with_network_trainer:
                # first-task-as-init: adopt body+head params (and geometry)
                # from a previously trained model
                init_tr = restore_trainer(args.initialize_with_network_trainer, opts)
                trainer.mh = init_tr.mh.add_n_tasks_and_activate(
                    init_tr.mh.tasks, init_tr.mh.tasks[-1])
                trainer.model = init_tr.model
                trainer.patch_size = init_tr.patch_size
                print(f"[fold {fold}] initialized from "
                      f"{args.initialize_with_network_trainer} "
                      f"(tasks {init_tr.mh.tasks})")
        trainer.metadata_folder = meta_dir

        for idx, task in enumerate(task_names):
            if task in finished:
                continue
            out_dir = build_output_folder(
                results, args.network, task_names, task_names[: idx + 1],
                trainer_name, args.plans_identifier, fold, transfer, **arch_kwargs)
            trainer.set_output_folder(out_dir)
            stage = stage_dir_for(pre, task, args.network)
            start = resume_epoch if task == resume_task else 0
            trainer.train_task(task, stage, start_epoch=start)
            print(f"[fold {fold}] finished {task} -> {out_dir}")

        if args.disable_saving:
            for idx in range(len(task_names) - 1):
                out_dir = build_output_folder(
                    results, args.network, task_names, task_names[: idx + 1],
                    trainer_name, args.plans_identifier, fold, transfer, **arch_kwargs)
                shutil.rmtree(out_dir, ignore_errors=True)
    return 0


def _camel(ext: str) -> str:
    special = {"ewc_vit": "EWCViT", "ewc_unet": "EWCUNet", "ewc_ln": "EWCLN",
               "ewc": "EWC", "rw": "RW", "lwf": "LWF", "mib": "MiB",
               "plop": "PLOP", "pod": "POD", "froz_ewc": "FrozEWC",
               "frozen_vit": "FrozenViT", "frozen_nonln": "FrozenNonLN",
               "frozen_unet": "FrozenUNet", "frozen_body_seq": "FrozenBody",
               "ownm1": "OwnM1", "ownm2": "OwnM2", "ownm3": "OwnM3",
               "ownm4": "OwnM4", "multihead": "MultiHead",
               "sequential": "Sequential", "rehearsal": "Rehearsal"}
    return special.get(ext, ext.capitalize())


def _make_main(ext):
    def main():
        return run_training(ext)
    main.__name__ = f"main_{ext}"
    return main


# console-script entry points (reference setup.py:35-70)
for _ext in TRAINER_MAP:
    globals()[f"main_{_ext}"] = _make_main(_ext)


if __name__ == "__main__":
    import sys
    ext = sys.argv.pop(1) if len(sys.argv) > 1 and sys.argv[1] in TRAINER_MAP else "sequential"
    run_training(ext)
