"""Multi-head (shared body / per-task heads) as parameter-tree partitioning.

Functional replacement for the reference's ``MultiHead_Module``
(``nnunet_ext/network_architecture/MultiHead_Module.py:10-572``), which
mutates an ``nn.Module`` by recursively splitting it at a dot-path and
deep-copying head modules every iteration (``update_after_iteration``,
``:139-157``).  In JAX, parameters are data: the same semantics become a
*partition of the parameter pytree*:

  * ``split``: partition flattened param paths into body / head by position
    in the model's topological module order (reference ``:159-324``)
  * ``assemble``: dict merge — free (reference ``:326-377`` rebuilds modules
    and reloads state_dicts)
  * ``update_after_iteration``: **gone** — the optimizer already updates the
    right leaves; we write back into the head registry only at task
    boundaries (`absorb`)
  * ``add_new_task(task, use_init)``: new head copied from ``state_init``
    (Multi-Head behavior) or from the active head (Sequential / transfer)
    (reference ``:435-458``)
  * body freezing: a boolean mask for ``optax.masked`` instead of
    ``requires_grad`` flips (reference ``:379-395``)

Keys are '/'-joined flax param paths, e.g. ``seg0/kernel`` or
``dec2/block1/Conv_0/kernel``.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field, replace

import jax
from flax import traverse_util

# Reference split-spec aliases: the default CL split is at the seg heads
# ('-s seg_outputs', run_training.py). Our seg heads are named seg0..segN.
_SPEC_ALIASES = {
    "seg_outputs": "seg",
    "seg_outputs.0": "seg",
}


def flatten(params) -> dict:
    return {"/".join(k): v for k, v in traverse_util.flatten_dict(params).items()}


def unflatten(flat: dict):
    return traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def _normalize_spec(split_at: str) -> str:
    spec = split_at.strip().replace(" ", "").replace(".", "/")
    return _SPEC_ALIASES.get(split_at.strip(), _SPEC_ALIASES.get(spec, spec))


def _order_key(path: str, module_order: list):
    top = path.split("/")[0]
    try:
        idx = module_order.index(top)
    except ValueError:
        idx = len(module_order)  # unknown modules sort last (treated as head-adjacent)
    return (idx, path)


def _match(path: str, spec: str) -> bool:
    if spec == "seg":
        return path.split("/")[0].startswith("seg")
    return path == spec or path.startswith(spec + "/") or path.split("/")[0] == spec


def split_params(params, split_at: str, module_order: list):
    """Partition params into (body, head): the head is every leaf at or after
    (in topological order) the FIRST leaf matching ``split_at``.
    Matches the reference's recursive split semantics (``:159-324``) without
    any copying."""
    flat = flatten(params) if not _is_flat(params) else dict(params)
    spec = _normalize_spec(split_at)
    ordered = sorted(flat.keys(), key=lambda p: _order_key(p, module_order))
    match_pos = [i for i, p in enumerate(ordered) if _match(p, spec)]
    if not match_pos:
        raise ValueError(
            f"split_at={split_at!r} (normalized {spec!r}) matches no parameter path. "
            f"Available top-level modules: {sorted({p.split('/')[0] for p in ordered})}")
    cut = match_pos[0]
    body = {p: flat[p] for p in ordered[:cut]}
    head = {p: flat[p] for p in ordered[cut:]}
    return body, head


def _is_flat(params) -> bool:
    return isinstance(params, dict) and all(not isinstance(v, dict) for v in params.values())


@dataclass
class MultiHeadParams:
    """The whole multi-head network state: shared body + per-task heads.
    ``state_init`` preserves the freshly-initialized head for Multi-Head-style
    task addition (reference keeps a deep copy of the split model at init)."""
    body: dict                                   # flat {path: array}
    heads: "OrderedDict[str, dict]"              # task -> flat {path: array}
    split_at: str
    module_order: list
    state_init: dict = field(default_factory=dict)
    active_task: str = ""

    @staticmethod
    def create(params, split_at: str, module_order: list, task: str) -> "MultiHeadParams":
        body, head = split_params(params, split_at, module_order)
        return MultiHeadParams(
            body=body, heads=OrderedDict({task: head}), split_at=split_at,
            module_order=list(module_order),
            state_init=jax.tree.map(lambda x: x, head),
            active_task=task,
        )

    # -- reference API equivalents ------------------------------------------

    def add_new_task(self, task: str, use_init: bool = True) -> "MultiHeadParams":
        """New head from state_init (Multi-Head) or from the active head
        (Sequential / transfer_heads=True). Reference ``:435-458``."""
        if task in self.heads:
            return replace(self, active_task=task)
        # state_init may be empty when restored from a transfer-heads
        # checkpoint (checkpoint diet skips the duplicate initial-head
        # blob) — fall back to the active head, which IS the semantics
        # those trainers use (use_init=False) anyway
        src = (self.state_init if use_init and self.state_init
               else self.heads[self.active_task])
        heads = OrderedDict(self.heads)
        heads[task] = jax.tree.map(lambda x: x, src)
        return replace(self, heads=heads, active_task=task)

    def add_n_tasks_and_activate(self, tasks: list, active: str,
                                 use_init: bool = True) -> "MultiHeadParams":
        """Pre-create heads for checkpoint restore (reference ``:460-485``)."""
        mh = self
        for t in tasks:
            mh = mh.add_new_task(t, use_init=use_init)
        return replace(mh, active_task=active)

    def assemble(self, task: str | None = None):
        """Full nested param tree for model.apply (reference ``:326-377`` —
        there a deep-copy + state_dict reload; here a dict merge)."""
        task = task or self.active_task
        merged = dict(self.body)
        merged.update(self.heads[task])
        return unflatten(merged)

    def absorb(self, params, task: str | None = None) -> "MultiHeadParams":
        """Write trained full params back into body + heads[task].  Called at
        task/checkpoint boundaries — NOT per iteration (the reference re-split
        every iteration, ``update_after_iteration`` ``:139-157``)."""
        task = task or self.active_task
        body, head = split_params(params, self.split_at, self.module_order)
        heads = OrderedDict(self.heads)
        heads[task] = head
        return replace(self, body=body, heads=heads)

    def trainable_mask(self, freeze_body: bool = False):
        """Boolean pytree (same structure as assemble()) for optax.masked:
        False leaves are frozen. Reference freezes via requires_grad
        (``:379-395``)."""
        flat = {p: (not freeze_body) for p in self.body}
        flat.update({p: True for p in self.heads[self.active_task]})
        return unflatten(flat)

    @property
    def tasks(self) -> list:
        return list(self.heads.keys())


def replace_params(params, predicate, fn):
    """Functional counterpart of the reference's ``replace_layers`` utility
    (``MultiHead_Module.py:544-572``, swapping layer types in-place): map
    ``fn`` over every leaf whose path satisfies ``predicate(path)``; other
    leaves are returned untouched.  Returns a new tree (no mutation)."""
    flat = flatten(params)
    return unflatten({p: (fn(v) if predicate(p) else v) for p, v in flat.items()})


def name_filter_mask(params, substrings: list, include: bool):
    """Boolean pytree selecting leaves whose path contains ALL substrings
    (include=True) or the complement (include=False).  Replaces the
    reference's EWC param-name match/match_true filtering
    (``deep_supervision.py:68-70``, ewc_ln/ewc_vit/ewc_unet)."""
    flat = flatten(params)
    out = {}
    for p in flat:
        hit = all(s.lower() in p.lower() for s in substrings)
        out[p] = hit if include else (not hit)
    return unflatten(out)
