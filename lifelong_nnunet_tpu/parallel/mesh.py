"""Device-mesh sharding: the framework's scale-out layer.

The reference has NO distributed backend (SURVEY.md §2.7) — its only
multi-GPU uses are manual ``.to('cuda:1')`` placements of the ViT or the
frozen teacher network.  Here scale-out is SPMD over a
``jax.sharding.Mesh`` with two axes:

  * ``data``  — batch dimension (replaces the absent DDP)
  * ``model`` — feature/channel dimension of conv kernels and activations
                (replaces the manual 2-GPU model split; XLA inserts the
                all-gathers/reduce-scatters over ICI)

A teacher network (PLOP/MiB/LwF) is just a second sharded param pytree —
no explicit device copies.  For very large volumes the same 'model' axis can
shard a spatial dim of the input (GSPMD handles conv halo exchange); see
``batch_sharding(spatial_axis=...)``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_parallel: int | None = None,
              axis_names=("data", "model"), devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data_parallel is None:
        # favor data parallelism; model axis = 2 when divisible
        model = 2 if n % 2 == 0 and n > 1 else 1
        data_parallel = n // model
    model = n // data_parallel
    grid = np.array(devs).reshape(data_parallel, model)
    return Mesh(grid, axis_names)


def param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for model params: conv/dense kernels shard their
    OUTPUT-feature (last) dim over the model axis when divisible; small
    tensors (norm scales, biases) replicate.  XLA/GSPMD propagates matching
    activation shardings and inserts collectives."""
    m = mesh.shape[model_axis]

    def rule(x):
        if x.ndim >= 2 and x.shape[-1] % m == 0 and x.shape[-1] >= 2 * m:
            spec = [None] * (x.ndim - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data",
                   spatial_axis: int | None = None, model_axis: str = "model"):
    """Sharding for a [B, *spatial, C] batch: batch over data axis; optionally
    one spatial dim over the model axis (sequence-parallel analog for huge
    volumes — GSPMD inserts conv halo exchanges)."""
    spec = [data_axis] + [None] * (ndim - 1)
    if spatial_axis is not None:
        spec[1 + spatial_axis] = model_axis
    return NamedSharding(mesh, P(*spec))


def shard_pytree(tree, shardings):
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
