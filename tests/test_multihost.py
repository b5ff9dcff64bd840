"""2-process multi-host CPU test (VERDICT r2 next #5): real
``jax.distributed`` with two processes x 4 virtual CPU devices each —
exercises the per-host input split, the Prefetcher's global-array assembly,
numeric equivalence of the data-parallel step with a single-process run,
and the one-writer checkpoint gate.  SURVEY §2.7: multi-host DCN is used
only for the input pipeline and checkpoint I/O."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same deterministic 2-step SGD run on ONE process (global batch in
    one device-replicated jit) — the numeric target for the workers."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    rng = np.random.RandomState(1234)
    gdata = rng.normal(size=(8, 8, 8, 8, 1)).astype(np.float32)
    gseg = rng.randint(0, 3, size=(8, 8, 8, 8)).astype(np.int32)

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(4, (3, 3, 3))(x)
            h = nn.relu(h)
            return nn.Conv(3, (1, 1, 1))(h)

    model = _Tiny()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 8, 8, 8, 1), np.float32))
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

    p2, o2, l1 = step(params, opt_state, gdata, gseg)
    _, _, l2 = step(p2, o2, gdata, gseg)
    return float(l1), float(l2)


def test_two_process_input_split_and_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": _REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = []
    scratch = [str(tmp_path / f"host{i}") for i in range(2)]
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, coord, str(pid), "2", scratch[pid]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"SHARD_OK {pid}" in out
        assert f"PIPELINE_OK {pid}" in out
        assert f"CKPT_GATE_DONE {pid}" in out

    # numeric equivalence with the single-process run, and across processes
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES "):
                _, pid, l1, l2 = line.split()
                losses[int(pid)] = (float(l1), float(l2))
    assert set(losses) == {0, 1}
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    ref = _single_process_reference()
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5, atol=1e-6)

    # one-writer gate: only host 0's scratch dir has the manifest
    f0 = os.path.join(scratch[0], "probe_trained_on.json")
    f1 = os.path.join(scratch[1], "probe_trained_on.json")
    assert os.path.isfile(f0), "host 0 must write the manifest"
    assert not os.path.exists(f1), "host 1 must NOT write the manifest"
