"""Subprocess body for the 2-process multi-host CPU test (VERDICT r2 next #5).

Launched twice by tests/test_multihost.py with
``JAX_PLATFORMS=cpu  XLA_FLAGS=--xla_force_host_platform_device_count=4``
and argv = [coordinator_address, process_id, num_processes].  Each process
sees 4 local CPU devices → an 8-device global 'data' mesh, the same topology
the SPMD trainer uses on a 2-host TPU slice (SURVEY §2.7: DCN only for input
pipeline and checkpoint I/O).

Asserts, in-process:
  1. input_shard() == (pid, 2); the PatchSampler forced-fg rule fires at
     GLOBAL batch positions (host 0 of batch 8 @ oversample 0.33: none;
     host 1: rows 1..3 of its local 4).
  2. The Prefetcher's global-array assembly places each host's local rows at
     the right GLOBAL row block (values encode global row ids; verified via
     process_allgather).
  3. A data-parallel train step over the global mesh produces a loss every
     process agrees on, printed for the parent to compare with its own
     single-process run of the SAME global batch.
  4. Only process 0 writes checkpoint/manifest files (checked by the parent
     via the per-process scratch dirs passed in argv[4]).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    coord, pid, nproc, scratch = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    # ---- 1. sampler shard arithmetic -------------------------------------
    from lifelong_nnunet_tpu.data.sampler import PatchSampler, input_shard
    assert input_shard() == (pid, nproc), input_shard()

    class _FakeDs:
        pass

    sampler = PatchSampler(_FakeDs(), ["c0"], (8, 8, 8), batch_size=8,
                           oversample_foreground_percent=0.33, seed=0,
                           shard=input_shard())
    assert sampler.batch_size == 8 // nproc
    fg = [sampler._needs_fg(i) for i in range(sampler.batch_size)]
    # global forced-fg rows of batch 8 @ 0.33 oversample: rows >= round(5.36)=5
    expect = [(pid * sampler.batch_size + i) >= 5
              for i in range(sampler.batch_size)]
    assert fg == expect, (pid, fg, expect)
    print(f"SHARD_OK {pid}", flush=True)

    # ---- 2. Prefetcher global assembly ------------------------------------
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    from lifelong_nnunet_tpu.data.pipeline import Prefetcher
    local_b = 8 // nproc

    class _RowIdSampler:
        """Local rows carry their GLOBAL row id so misplacement is visible."""
        def next_batch(self):
            ids = np.arange(pid * local_b, (pid + 1) * local_b, dtype=np.float32)
            data = np.broadcast_to(ids[:, None, None, None, None],
                                   (local_b, 4, 4, 4, 1)).copy()
            seg = np.broadcast_to(ids[:, None, None, None].astype(np.int32),
                                  (local_b, 4, 4, 4)).copy()
            return {"data": data, "seg": seg, "keys": [f"g{int(i)}" for i in ids]}

    pf = Prefetcher(_RowIdSampler(), sharding=sharding, depth=1)
    dev, _ = pf.next()
    pf.stop()
    assert dev["data"].shape == (8, 4, 4, 4, 1), dev["data"].shape
    from jax.experimental import multihost_utils
    # gather the full global array onto every process and check row values
    full = multihost_utils.process_allgather(dev["data"], tiled=True)
    got = np.asarray(full)[:, 0, 0, 0, 0]
    np.testing.assert_array_equal(got, np.arange(8, dtype=np.float32))
    print(f"PIPELINE_OK {pid}", flush=True)

    # ---- 3. numeric equivalence of a DP train step -------------------------
    # same deterministic global batch as the parent's single-process run
    rng = np.random.RandomState(1234)
    gdata = rng.normal(size=(8, 8, 8, 8, 1)).astype(np.float32)
    gseg = rng.randint(0, 3, size=(8, 8, 8, 8)).astype(np.int32)
    local = slice(pid * local_b, (pid + 1) * local_b)

    import flax.linen as nn
    import optax

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(4, (3, 3, 3))(x)
            h = nn.relu(h)
            return nn.Conv(3, (1, 1, 1))(h)

    model = _Tiny()
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8, 8, 1),
                                                        np.float32))
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb):
        logits = model.apply(p, xb)
        oh = jax.nn.one_hot(yb, 3)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    @jax.jit
    def step(p, o, xb, yb):
        l, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    xg = jax.make_array_from_process_local_data(sharding, gdata[local])
    yg = jax.make_array_from_process_local_data(sharding, gseg[local])
    prepl = jax.device_put(params, NamedSharding(mesh, P()))
    orepl = jax.device_put(opt_state, NamedSharding(mesh, P()))
    p2, o2, l1 = step(prepl, orepl, xg, yg)
    _, _, l2 = step(p2, o2, xg, yg)
    print(f"LOSSES {pid} {float(l1):.8f} {float(l2):.8f}", flush=True)

    # ---- 4. checkpoint single-writer gate ----------------------------------
    # exercise the gate directly: the trainer method returns early off host 0
    os.makedirs(scratch, exist_ok=True)
    from lifelong_nnunet_tpu.training import trainer as trainer_mod

    class _Probe:
        # minimal attribute surface for _update_manifest
        metadata_folder = scratch
        EXTENSION = "probe"
        already_trained_on = {}
        hyperparams = {}

        class opts:
            fold = 0

        class plans:
            plans_name = "x"

        def _trained_on_path(self):
            return trainer_mod.MultiHeadTrainer._trained_on_path(self)

    trainer_mod.MultiHeadTrainer._update_manifest(_Probe(), start_training_on="T")
    print(f"CKPT_GATE_DONE {pid}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
