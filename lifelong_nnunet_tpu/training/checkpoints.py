"""Checkpointing: msgpack state + JSON manifest.

Replaces the reference's two-file nnU-Net format (``<ckpt>.model`` =
state_dict+optimizer+epoch, ``<ckpt>.model.pkl`` = ctor args for
``restore_model`` — ``multihead/nnUNetTrainerMultiHead.py:1164-1223``,
``model_restore.py:33-140``) with:

    <name>.ckpt      flax-serialized {mh, opt_state, cl_state, step, epoch, ...}
    <name>.json      manifest: trainer class, ctor kwargs, plans path, tasks

Checkpoint names follow the reference: ``model_final_checkpoint``,
``model_latest``, ``model_best`` (+ method extras like ``model_old`` /
``model_freezed``).  The manifest stores only relative paths so a moved
results tree keeps working (the reference needs ``nnUNet_update_checkpoints``
to rewrite absolute paths — our equivalent script exists for compat but the
format avoids the problem).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import jax
import numpy as np
from flax import serialization

from ..models.multihead import MultiHeadParams


def _mh_to_state(mh: MultiHeadParams) -> dict:
    return {
        "body": dict(mh.body),
        "heads": {t: dict(h) for t, h in mh.heads.items()},
        "state_init": dict(mh.state_init),
        "meta": {
            "split_at": mh.split_at,
            "module_order": list(mh.module_order),
            "active_task": mh.active_task,
            "task_order": list(mh.heads.keys()),
        },
    }


def _mh_from_state(d: dict) -> MultiHeadParams:
    meta = d["meta"]
    heads = OrderedDict((t, d["heads"][t]) for t in meta["task_order"])
    return MultiHeadParams(body=d["body"], heads=heads, state_init=d["state_init"],
                           split_at=meta["split_at"], module_order=meta["module_order"],
                           active_task=meta["active_task"])


def save_checkpoint(path_base: str, mh: MultiHeadParams, opt_state=None,
                    cl_state=None, step: int = 0, epoch: int = 0,
                    manifest: dict | None = None, extra: dict | None = None,
                    include_state_init: bool = True):
    os.makedirs(os.path.dirname(path_base) or ".", exist_ok=True)
    mh_state = _mh_to_state(mh)
    meta = mh_state.pop("meta")
    if not include_state_init:
        # checkpoint diet: transfer-heads trainers (Sequential family) seed
        # new heads from the ACTIVE head, never from state_init — dropping
        # the duplicate initial-head copy; models.multihead.add_new_task
        # falls back to the active head if state_init is empty
        mh_state["state_init"] = {}
    blob = {
        "mh": jax.tree.map(np.asarray, mh_state),
        "opt_state": jax.tree.map(np.asarray, opt_state) if opt_state is not None else {},
        "cl_state": jax.tree.map(np.asarray, cl_state) if cl_state is not None else {},
        "extra": jax.tree.map(np.asarray, extra) if extra else {},
    }
    # to_state_dict converts tuples/namedtuples (optax states) into msgpack-able dicts
    with open(path_base + ".ckpt", "wb") as f:
        f.write(serialization.msgpack_serialize(serialization.to_state_dict(blob)))
    man = dict(manifest or {})
    man.update({"meta": meta, "step": int(step), "epoch": int(epoch),
                "has_opt_state": opt_state is not None,
                "has_cl_state": cl_state is not None})
    with open(path_base + ".json", "w") as f:
        json.dump(man, f, indent=2, default=str)


def load_checkpoint(path_base: str):
    """Returns (mh, blob, manifest). ``blob['opt_state']``/``blob['cl_state']``
    are raw pytrees of numpy arrays; callers restore structure with
    ``serialization.from_state_dict`` against a template when needed."""
    with open(path_base + ".ckpt", "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    with open(path_base + ".json") as f:
        manifest = json.load(f)
    mh_state = dict(blob["mh"])
    mh_state["meta"] = manifest["meta"]
    mh = _mh_from_state(mh_state)
    return mh, blob, manifest


def restore_into(template, state_dict):
    """Restore a serialized pytree into the structure of ``template``."""
    return serialization.from_state_dict(template, state_dict)


def checkpoint_exists(path_base: str) -> bool:
    return os.path.isfile(path_base + ".ckpt") and os.path.isfile(path_base + ".json")
