"""Full-scale learning regression on the real chip (the round-2 close check,
kept as a tool so every round can re-run it after training-path changes —
round 3 uses it to validate the Pallas-conv-by-default training path).

Synthetic hippocampus-scale site (tests/synthetic.py — no MSD data in this
environment), plans-driven full-width model, short real run through the
actual CLI entry point (`run_training sequential`): asserts the validation
fg-dice RISES and prints the trajectory so RESULTS.md can quote it.

Usage (healthy chip, idle host):  python tools/chip_train_regression.py
  --epochs 6 --iters 50            (defaults; ~5-10 min wall incl. compiles)
  --no_pallas                      (A/B: force the XLA conv path)
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cases", type=int, default=14)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for a CPU plumbing check (not a "
                         "learning regression; skips the dice assert)")
    args = ap.parse_args()
    if args.no_pallas:
        os.environ["LNN_PALLAS_CONV"] = "0"

    root = tempfile.mkdtemp(prefix="chip_train_reg_")
    raw = os.path.join(root, "raw", "nnUNet_raw_data")
    os.makedirs(raw)
    os.environ.update({
        "nnUNet_raw_data_base": os.path.join(root, "raw"),
        "nnUNet_preprocessed": os.path.join(root, "pre"),
        "RESULTS_FOLDER": os.path.join(root, "results"),
        "EVALUATION_FOLDER": os.path.join(root, "eval"),
        "PARAM_SEARCH_FOLDER": os.path.join(root, "ps"),
    })
    from tests.synthetic import make_synthetic_task
    shape = (20, 24, 20) if args.smoke else (60, 84, 60)
    make_synthetic_task(raw, task_name="Task097_SynthA",
                        num_cases=6 if args.smoke else args.cases,
                        seed=3, shape=shape)

    from lifelong_nnunet_tpu.run.plan_and_preprocess import main as pap_main
    argv = sys.argv
    sys.argv = ["nnUNet_plan_and_preprocess", "-t", "97", "-pl", "3d_fullres"]
    try:
        pap_main()
    finally:
        sys.argv = argv

    import re

    from lifelong_nnunet_tpu.run.run_training import run_training
    cli = ["3d_fullres", "-t", "97", "-f", "0",
           "-num_epochs", str(args.epochs), "-num_iters", str(args.iters),
           "-val_iters", "10"]
    if args.smoke:
        cli += ["-num_iters", "4", "-val_iters", "2", "-batch_size", "2",
                "-base_features", "4", "-max_features", "16", "--fp32",
                "--no_augment"]
    t0 = time.perf_counter()
    run_training("sequential", cli)
    wall = time.perf_counter() - t0

    # parse the per-epoch lines ("... val <loss> fg-dice <d> ...") from the
    # RunLogger's persisted training_log_*.txt
    logs = []
    for dirpath, _, files in os.walk(os.path.join(root, "results")):
        logs += [os.path.join(dirpath, f) for f in files
                 if f.startswith("training_log_") and f.endswith(".txt")]
    assert logs, "no training_log_*.txt written"
    text = "".join(open(p).read() for p in sorted(logs))
    pairs = re.findall(r"val ([0-9.]+) fg-dice ([0-9.]+)", text)
    assert pairs, "no per-epoch val lines captured"
    losses = [float(a) for a, _ in pairs]
    dices = [float(b) for _, b in pairs]
    print(f"wall {wall:.0f}s  val fg-dice trajectory: "
          + " -> ".join(f"{d:.3f}" for d in dices))
    print("val loss trajectory: " + " -> ".join(f"{l:.3f}" for l in losses))
    if not args.smoke:
        assert dices[-1] >= dices[0] and dices[-1] > 0.9, \
            f"learning regression: fg-dice {dices}"
    print("LEARNING REGRESSION PASS "
          f"(pallas={'off' if args.no_pallas else 'default-on'})")


if __name__ == "__main__":
    main()
