"""Host→device input pipeline: background sampling + device prefetch.

Replaces the reference's batchgenerators ``MultiThreadedAugmenter`` worker
processes (SURVEY.md §2.7 "CPU pipeline parallelism").  The host thread only
does memmap patch gathers (cheap); augmentation runs on-device
(`augment.py`), so one background thread + a depth-2 device queue keeps the
TPU fed.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np


class Prefetcher:
    """Wraps an iterator of host batches; moves them to device ahead of time."""

    def __init__(self, sampler, depth: int = 2, sharding=None):
        self.sampler = sampler
        self.sharding = sharding
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self.sampler.next_batch()
            sh = self.sharding if isinstance(self.sharding, dict) else \
                {"data": self.sharding, "seg": self.sharding}
            dev = {
                "data": self._put(batch["data"], sh.get("data")),
                "seg": self._put(batch["seg"], sh.get("seg")),
            }
            while not self._stop.is_set():
                try:
                    self.q.put((dev, batch.get("keys")), timeout=0.5)
                    break
                except queue.Full:
                    continue

    @staticmethod
    def _put(arr, sharding):
        """Single host: plain (sharded) device_put of the full batch.
        Multi-host SPMD: each process holds only its sampler shard of the
        global batch — assemble the global jax.Array from the process-local
        rows (the 'data'-axis sharding maps contiguous row blocks to each
        host's local devices, matching PatchSampler's contiguous shard)."""
        if sharding is not None and jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    def next(self):
        dev, keys = self.q.get()
        return dev, keys

    def __next__(self):
        return self.next()

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
