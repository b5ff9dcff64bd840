"""int8 quality cost in DICE, not voxel agreement (VERDICT r3 next #8).

Round 3 reported the opt-in mixed-precision path (LNN_INT8_CONV=64) at
"99.02% voxel agreement" — the wrong unit: 1% of voxels concentrated on
small-structure boundaries can be many Dice points.  This tool measures the
per-class Dice delta through the REAL inference pipeline (run_evaluation2 =
the quality contract of evaluator2.py):

  1. train a synthetic-site model whose topology actually HAS >=64-channel
     stages (base 32, max 128 — min(Cin,Cout)>=64 routes 2 stages to int8),
  2. run the full predict->score pipeline twice: bf16/f32 baseline vs
     LNN_INT8_CONV=64,
  3. report per-class Dice for both arms and the delta.

Quantization math (clip/round/rescale in models/unet._int8_conv) is
platform-deterministic, so the CPU run measures the same quality the TPU
path ships.

  python tools/int8_dice_eval.py [--epochs 8] [--out results/r4/int8_dice.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cases", type=int, default=12)
    ap.add_argument("--int8_min_ch", type=int, default=64)
    ap.add_argument("--out", default="results/r4/int8_dice.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tests.synthetic import make_synthetic_task
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    from lifelong_nnunet_tpu.training.trainer import TrainerOptions
    from lifelong_nnunet_tpu.training.trainers import TRAINER_MAP
    from lifelong_nnunet_tpu.evaluation.evaluator2 import run_evaluation2

    root = tempfile.mkdtemp(prefix="int8_dice_")
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    task = "Task090_Blobs"
    task_dir = make_synthetic_task(raw, task_name=task, num_cases=args.cases,
                                   seed=0, shape=(32, 40, 32), style="blobs")
    plans = plan_experiment(analyze_dataset(task_dir))
    stage = preprocess_task(task_dir, plans, os.path.join(root, "pre"),
                            configs=("3d_fullres",))["3d_fullres"]

    # base 32 / max 128: stages C = 32, 64, 128 -> min(Cin,Cout)>=64 routes
    # the two deepest encoder/decoder stages through int8
    opts = TrainerOptions(
        num_epochs=args.epochs, iters_per_epoch=args.iters, val_iters=4,
        save_every=100, batch_size=2, patch_size=(20, 24, 20),
        augment=False, use_progress_val=False, dtype="float32",
        base_num_features=32, max_num_features=128)
    out_dir = os.path.join(root, "train")
    tr = TRAINER_MAP["sequential"](plans, "3d_fullres", out_dir, opts)
    tr.train_task(task, stage)
    ckpt = os.path.join(out_dir, "model_final_checkpoint")
    print(f"trained; checkpoint {ckpt}", flush=True)

    def arm(int8: bool) -> dict:
        if int8:
            os.environ["LNN_INT8_CONV"] = str(args.int8_min_ch)
        else:
            os.environ.pop("LNN_INT8_CONV", None)
        out = os.path.join(root, "eval_int8" if int8 else "eval_base")
        res = run_evaluation2(ckpt, {task: task_dir}, out, fold=0)
        return res

    base = arm(False)
    quant = arm(True)

    def per_class(res) -> dict:
        per = {}
        for case, m in res[task]["cases"].items():
            for ci, v in enumerate(m["Dice"]):
                per.setdefault(ci + 1, []).append(v)
        return {c: float(np.nanmean(v)) for c, v in sorted(per.items())}

    b, q = per_class(base), per_class(quant)
    report = {
        "int8_min_ch": args.int8_min_ch,
        "dice_baseline": b,
        "dice_int8": q,
        "dice_delta": {c: q.get(c, float("nan")) - b[c] for c in b},
        "config": vars(args),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    print("\n| class | Dice bf16/f32 | Dice int8 | delta |")
    print("|---|---|---|---|")
    for c in b:
        print(f"| {c} | {b[c]:.4f} | {q.get(c, float('nan')):.4f} "
              f"| {q.get(c, float('nan')) - b[c]:+.4f} |")


if __name__ == "__main__":
    main()
