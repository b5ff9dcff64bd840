"""Model/trainer restoration from checkpoints.

Counterpart of the reference's ``model_restore.py:33-140`` /
``model_restore_pred.py:18-109``: re-instantiate the right trainer class from
a checkpoint's manifest (which embeds the ctor-relevant config AND the full
plans — the reference's ``.model.pkl`` ``info['init']`` tuple), restore the
multi-head params, optimizer and CL state.

The reference restores patch_size/pool kernels from the FIRST task so later
plans don't reshape the net (``:120-134``); here the plans stored in the
manifest are by construction the first task's (the trainer keeps one Plans
object for its lifetime), so the invariant holds structurally.
"""

from __future__ import annotations

import json
import os

from ..planning.plans import Configuration, Plans
from .trainer import MultiHeadTrainer, TrainerOptions


def plans_from_manifest(manifest: dict) -> Plans:
    d = dict(manifest["plans"])
    d["configurations"] = {k: Configuration(**v) for k, v in d["configurations"].items()}
    for key in ("modalities", "labels", "normalization_schemes", "use_mask_for_norm"):
        d[key] = {int(k): v for k, v in d[key].items()}
    d["intensity_properties"] = {int(k): v for k, v in d["intensity_properties"].items()}
    return Plans(**d)


def restore_trainer(checkpoint_base: str, options: TrainerOptions | None = None,
                    restore_opt: bool = False) -> MultiHeadTrainer:
    """checkpoint_base: path WITHOUT extension (e.g. .../model_final_checkpoint).
    Returns a fully-initialized trainer of the original class with mh params
    (+ optional optimizer state) loaded."""
    from .trainers import get_trainer

    with open(checkpoint_base + ".json") as f:
        manifest = json.load(f)
    plans = plans_from_manifest(manifest)
    try:
        cls = get_trainer(manifest["extension"])
    except KeyError:
        cls = get_trainer(manifest["trainer"])
    opts = options or TrainerOptions()
    opts.fold = manifest.get("fold", opts.fold)
    opts.split_at = manifest.get("split_at", opts.split_at)
    if manifest.get("patch_size"):
        opts.patch_size = tuple(manifest["patch_size"])
    if manifest.get("batch_size"):
        opts.batch_size = manifest["batch_size"]
    if manifest.get("base_num_features"):
        opts.base_num_features = manifest["base_num_features"]
    if manifest.get("max_num_features"):
        opts.max_num_features = manifest["max_num_features"]
    vit = manifest.get("vit")
    if manifest.get("use_vit") and vit:
        opts.use_vit = True
        opts.vit_version = vit["version"]
        opts.vit_type = vit["type"]
        opts.vit_lsa = vit["lsa"]
        opts.vit_spt = vit["spt"]
        opts.vit_task_specific_ln = vit["task_specific_ln"]
        opts.vit_depth_override = vit.get("depth_override")
    hyper = _parse_hyperparams(cls, manifest.get("hyperparams", {}))
    out_dir = os.path.dirname(checkpoint_base)
    trainer = cls(plans, manifest["config_name"], out_dir, opts, **hyper)
    if vit and vit.get("ln_tasks"):
        trainer.model = trainer.model.clone(
            ln_tasks=tuple(vit["ln_tasks"]),
            active_task_idx=int(vit.get("active_task_idx", 0)))
    trainer.load_checkpoint(os.path.basename(checkpoint_base), restore_opt=restore_opt)
    return trainer


def _parse_hyperparams(cls, raw: dict) -> dict:
    out = {}
    for k, v in raw.items():
        typ = cls.HYPERPARAMS.get(k, str)
        try:
            if typ is bool:
                out[k] = str(v).lower() in ("true", "1")
            else:
                out[k] = typ(v)
        except (TypeError, ValueError):
            out[k] = v
    return out


def find_checkpoint(folder: str, prefer: str = "model_final_checkpoint") -> str | None:
    for name in (prefer, "model_latest", "model_best"):
        base = os.path.join(folder, name)
        if os.path.isfile(base + ".ckpt"):
            return base
    return None
