"""CLI: hyperparameter search — ``nnUNet_parameter_search``.

Counterpart of ``nnunet_ext/run/run_param_search.py``: grid or random search
over a trainer's declared HYPERPARAMS, with fixed parameters, crash-safe
resume (backup.json), and a joined summary CSV.

Grid values: ``-g param:v1,v2,...``; random ranges: ``-r param:lo:hi``;
fixed: ``--fixate param:value``.
"""

from __future__ import annotations

import argparse
import os

from .. import paths
from ..experiment.param_search import ParamSearcher
from ..planning.plans import Plans, plans_path
from ..training.trainer import TrainerOptions
from .plan_and_preprocess import resolve_task
from .run_training import stage_dir_for


def _parse_grid(specs):
    out = {}
    for s in specs or []:
        name, vals = s.split(":", 1)
        out[name] = [float(v) if _is_num(v) else v for v in vals.split(",")]
    return out


def _parse_ranges(specs):
    out = {}
    for s in specs or []:
        name, lo, hi = s.split(":")
        out[name] = (float(lo), float(hi))
    return out


def _parse_fixate(specs):
    out = {}
    for s in specs or []:
        name, v = s.split(":", 1)
        out[name] = float(v) if _is_num(v) else v
    return out


def _is_num(v):
    try:
        float(v)
        return True
    except ValueError:
        return False


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("network", choices=["2d", "3d_lowres", "3d_fullres"])
    p.add_argument("trainer", help="extension name (e.g. ewc, rw, mib)")
    p.add_argument("-t", "--task_ids", nargs="+", required=True)
    p.add_argument("-f", "--fold", type=int, default=0)
    p.add_argument("-s", "--search_mode", choices=["grid", "random"], default="grid")
    p.add_argument("-g", "--grid", nargs="+", default=None,
                   help="param:v1,v2,... (grid mode)")
    p.add_argument("-r", "--ranges", nargs="+", default=None,
                   help="param:lo:hi (random mode)")
    p.add_argument("--fixate", nargs="+", default=None, help="param:value")
    p.add_argument("-num_exp", type=int, default=10)
    p.add_argument("-num_epochs", type=int, default=25)
    p.add_argument("-num_iters", type=int, default=250)
    p.add_argument("-seed", type=int, default=3299)
    p.add_argument("-n_workers", type=int, default=1,
                   help="experiments run in parallel subprocesses (reference's "
                        "--run_in_parallel; use >1 only with per-worker devices)")
    p.add_argument("-devices_per_exp", type=int, default=0,
                   help="partition the host's chips across workers: worker i "
                        "owns devices [i*dpe, (i+1)*dpe) (reference's per-GPU "
                        "CUDA_VISIBLE_DEVICES partitioning, "
                        "param_searcher.py:276-357) and trains data-parallel "
                        "over them")
    p.add_argument("-device_backend", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("-p", "--plans_identifier", default=paths.default_plans_identifier)
    args = p.parse_args(argv)

    pre = paths.require(paths.preprocessed_dir(create=False), "preprocessed data")
    ps_root = paths.require(paths.param_search_dir(), "param search")
    task_names = [os.path.basename(resolve_task(t, pre)) for t in args.task_ids]
    stages = {t: stage_dir_for(pre, t, args.network) for t in task_names}
    plans = Plans.load(plans_path(os.path.join(pre, task_names[0]),
                                  args.plans_identifier))
    opts = TrainerOptions(num_epochs=args.num_epochs, iters_per_epoch=args.num_iters,
                          val_iters=max(10, args.num_iters // 5),
                          save_every=args.num_epochs, fold=args.fold)
    out = os.path.join(ps_root, args.network, "_".join(task_names),
                       args.trainer, f"fold_{args.fold}")
    searcher = ParamSearcher(
        args.trainer, plans, args.network, stages, out,
        search_mode=args.search_mode, grid=_parse_grid(args.grid),
        rand_ranges=_parse_ranges(args.ranges), num_random=args.num_exp,
        fixate=_parse_fixate(args.fixate), seed=args.seed, options=opts)
    results = searcher.start_searching(n_workers=args.n_workers,
                                       devices_per_exp=args.devices_per_exp,
                                       device_backend=args.device_backend)
    print(f"{len(results)} experiment(s) done -> {out}")
    return 0


if __name__ == "__main__":
    main()
