"""Foreground-oversampled patch sampling (host side).

Replaces upstream ``DataLoader2D/3D`` (SURVEY.md §2.8): each batch draws
random cases; a trailing fraction of samples (nnU-Net: 1/3) is forced to
contain a random foreground class by centering the patch on a sampled class
location.  Out-of-volume regions are padded (data 0, seg -1).

Output layout is channels-last ``[B, *patch, C]`` (TPU-native; XLA conv
prefers NDHWC) with seg ``[B, *patch]`` int8 — the device augmentation stage
(`augment.py`) and the train step consume this directly.
"""

from __future__ import annotations

import numpy as np

from .dataset import PreprocessedDataset


def input_shard() -> tuple:
    """(process_index, process_count): this host's slice of the multi-host
    input split — the single source of the host→batch-slice mapping (used by
    the base trainer and Rehearsal's mixed-pool sampler)."""
    import jax
    return (jax.process_index(), jax.process_count())


class PatchSampler:
    def __init__(self, dataset: PreprocessedDataset | None, cases: list, patch_size,
                 batch_size: int, oversample_foreground_percent: float = 0.33,
                 seed: int = 0, shard: tuple = (0, 1)):
        """``cases`` entries are either case-name strings (resolved against
        ``dataset``) or explicit ``(PreprocessedDataset, case)`` pairs — the
        latter lets Rehearsal-style trainers mix cases from several tasks'
        stage directories into one pool.

        ``shard=(index, count)`` is the multi-host input split: ``batch_size``
        stays the GLOBAL batch; this sampler emits only the contiguous
        [index*B/count, (index+1)*B/count) slice of it, with the nnU-Net
        forced-foreground rule evaluated at GLOBAL batch positions (the last
        round(B*oversample) samples of the global batch are forced-fg, no
        matter which host draws them) and the RNG stream decorrelated per
        shard.  Every host samples from the full case list — cases are not
        partitioned, matching upstream DataLoader3D under DDP, where each
        worker draws independently from all cases."""
        assert len(cases) > 0, "empty case list"
        self.items = [(dataset, c) if isinstance(c, str) else tuple(c) for c in cases]
        # native C++ gather engine (csrc/patch_gather.cpp): GIL-free threaded
        # batch assembly; falls back to numpy when no toolchain is available
        from . import native
        self._native = native.get_lib() is not None
        self.patch_size = tuple(int(p) for p in patch_size)
        self.dim = len(self.patch_size)
        self.global_batch_size = int(batch_size)
        self.shard_index, self.shard_count = int(shard[0]), int(shard[1])
        assert 0 <= self.shard_index < self.shard_count
        if batch_size % self.shard_count:
            raise ValueError(
                f"global batch {batch_size} must divide evenly over "
                f"{self.shard_count} input shards (hosts)")
        self.batch_size = int(batch_size) // self.shard_count
        self.oversample = oversample_foreground_percent
        self.rng = np.random.RandomState(seed + 7919 * self.shard_index)

    def _needs_fg(self, sample_idx: int) -> bool:
        # nnU-Net rule: the LAST round(batch * oversample) samples of the
        # GLOBAL batch are forced-fg; this host's samples sit at global
        # positions shard_index*local_B + i
        global_idx = self.shard_index * self.batch_size + sample_idx
        return global_idx >= round(self.global_batch_size * (1 - self.oversample))

    def _extract(self, ds: PreprocessedDataset, case: str, force_fg: bool):
        arr = ds.load(case)                           # [C+1, X, Y, Z] memmap
        if self.dim == 2:
            # 2D config: pick a random slice along the leading (coarsest) axis
            z = self.rng.randint(arr.shape[1])
            arr3 = arr[:, z]
            return self._extract_nd(arr3, ds, case, force_fg, slice_z=z)
        return self._extract_nd(arr, ds, case, force_fg)

    def _sample_origin(self, arr, ds, case: str, force_fg: bool, slice_z=None):
        """Random (possibly out-of-volume) patch origin, force-fg aware."""
        spatial = arr.shape[1:]
        patch = self.patch_size
        if force_fg:
            locs = ds.class_locations(case)
            classes = [c for c, v in locs.items() if len(v) > 0]
            if classes:
                cls = classes[self.rng.randint(len(classes))]
                pts = locs[cls]
                if slice_z is not None:
                    on_slice = pts[pts[:, 0] == slice_z]
                    pts = on_slice if len(on_slice) else pts
                center_full = pts[self.rng.randint(len(pts))]
                center = center_full[-len(patch):] if slice_z is not None else center_full
                lo = [int(center[a]) - patch[a] // 2 for a in range(len(patch))]
            else:
                lo = [self.rng.randint(min(0, spatial[a] - patch[a]),
                                       max(1, spatial[a] - patch[a] + 1))
                      for a in range(len(patch))]
        else:
            lo = [self.rng.randint(min(0, spatial[a] - patch[a]),
                                   max(1, spatial[a] - patch[a] + 1))
                  for a in range(len(patch))]
        return lo

    def _extract_nd(self, arr, ds, case: str, force_fg: bool, slice_z=None):
        spatial = arr.shape[1:]
        patch = self.patch_size
        lo = self._sample_origin(arr, ds, case, force_fg, slice_z)
        # clamp so we never start beyond volume, allow negative (pad)
        pad_before, pad_after, sl = [], [], []
        for a in range(len(patch)):
            start, stop = lo[a], lo[a] + patch[a]
            pb = max(0, -start)
            pa = max(0, stop - spatial[a])
            pad_before.append(pb)
            pad_after.append(pa)
            sl.append(slice(max(0, start), min(spatial[a], stop)))
        crop = np.asarray(arr[(slice(None),) + tuple(sl)])
        pads = [(0, 0)] + [(pad_before[a], pad_after[a]) for a in range(len(patch))]
        data = np.pad(crop[:-1], pads, mode="constant", constant_values=0.0)
        seg = np.pad(crop[-1:], pads, mode="constant", constant_values=-1.0)
        return data, seg[0]

    def next_batch(self) -> dict:
        if self.dim == 3 and self._native:
            return self._next_batch_native()
        n_mod = None
        datas, segs, keys = [], [], []
        for i in range(self.batch_size):
            ds, case = self.items[self.rng.randint(len(self.items))]
            data, seg = self._extract(ds, case, self._needs_fg(i))
            if n_mod is None:
                n_mod = data.shape[0]
            datas.append(np.moveaxis(data, 0, -1))   # channels-last
            segs.append(seg)
            keys.append(case)
        return {
            "data": np.stack(datas).astype(np.float32),
            "seg": np.stack(segs).astype(np.int8),
            "keys": keys,
        }

    def _next_batch_native(self) -> dict:
        from . import native
        arrays, origins, keys = [], [], []
        for i in range(self.batch_size):
            ds, case = self.items[self.rng.randint(len(self.items))]
            arr = ds.load(case)
            lo = self._sample_origin(arr, ds, case, self._needs_fg(i))
            arrays.append(arr)
            origins.append(lo)
            keys.append(case)
        data, seg = native.gather_patches(arrays, np.asarray(origins, np.int64),
                                          self.patch_size)
        return {"data": data, "seg": seg, "keys": keys}

    def __iter__(self):
        return self

    def __next__(self):
        return self.next_batch()
