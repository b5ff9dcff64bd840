"""Optimizer-step parity vs torch (VERDICT r3 missing #3).

The reference's update recipe (multihead/nnUNetTrainerMultiHead.py:294-301 +
upstream nnUNetTrainerV2): per iteration
    backward -> clip_grad_norm_(params, 12) -> SGD.step()
with ``torch.optim.SGD(lr=poly(epoch), momentum=0.99, nesterov=True,
weight_decay=3e-5)`` and the poly schedule
``lr = initial * (1 - epoch/max_epochs)**0.9`` recomputed per epoch.

These tests feed IDENTICAL initial weights and IDENTICAL per-step gradients
to torch's optimizer (in the reference's exact ordering: clip on raw grads,
weight decay inside SGD.step, nesterov momentum) and to the repo's optax
chain (``training/optimizer.py::make_optimizer``), then assert the resulting
parameters match to float32 tolerance after N steps — closing the last
executable cross-framework parity gap (forward parity:
test_model_parity_torch.py; loss parity: test_reference_parity.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lifelong_nnunet_tpu.training.optimizer import (  # noqa: E402
    make_optimizer, poly_lr_schedule)

MAX_EPOCHS = 10
ITERS_PER_EPOCH = 2
INITIAL_LR = 1e-2


def _make_tree(seed, scale):
    rng = np.random.RandomState(seed)
    return {
        "w1": rng.normal(size=(7, 5)).astype(np.float32) * scale,
        "b1": rng.normal(size=(5,)).astype(np.float32) * scale,
        "w2": rng.normal(size=(5, 3)).astype(np.float32) * scale,
    }


def _torch_reference_run(params_np, grads_np, n_steps, clip_norm=12.0):
    """The reference's exact loop: clip raw grads -> SGD(nesterov, wd)."""
    ps = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
          for k, v in params_np.items()}
    opt = torch.optim.SGD(ps.values(), lr=INITIAL_LR, momentum=0.99,
                          nesterov=True, weight_decay=3e-5)
    for step in range(n_steps):
        # upstream maybe_update_lr: lr recomputed from the CURRENT epoch
        epoch = step // ITERS_PER_EPOCH
        lr = INITIAL_LR * (1.0 - epoch / MAX_EPOCHS) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        for k, p in ps.items():
            p.grad = torch.from_numpy(grads_np[step][k].copy())
        torch.nn.utils.clip_grad_norm_(ps.values(), clip_norm)
        opt.step()
    return {k: p.detach().numpy() for k, p in ps.items()}


def _optax_run(params_np, grads_np, n_steps):
    tx = make_optimizer(max_epochs=MAX_EPOCHS, iters_per_epoch=ITERS_PER_EPOCH,
                        initial_lr=INITIAL_LR)
    params = jax.tree.map(jnp.asarray, params_np)
    state = tx.init(params)
    for step in range(n_steps):
        grads = jax.tree.map(jnp.asarray, grads_np[step])
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return jax.tree.map(np.asarray, params)


@pytest.mark.parametrize("grad_scale,label", [
    (20.0, "clipping_active"),   # global grad norm >> 12 -> clip fires
    (0.5, "clipping_inactive"),  # norm < 12 -> clip is identity
])
def test_n_step_update_parity(grad_scale, label):
    """3 steps, same weights + grads -> parameters equal <=1e-6."""
    params = _make_tree(0, 1.0)
    grads = [_make_tree(10 + s, grad_scale) for s in range(3)]
    ours = _optax_run(params, grads, 3)
    ref = _torch_reference_run(params, grads, 3)
    for k in params:
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-6, rtol=0,
                                   err_msg=f"{label}:{k}")


def test_poly_lr_across_epoch_boundary():
    """6 steps cross epochs 0->1->2; the per-epoch poly LR stepping must
    match torch's per-epoch param_group update (same epoch indexing)."""
    params = _make_tree(1, 1.0)
    grads = [_make_tree(20 + s, 1.0) for s in range(6)]
    ours = _optax_run(params, grads, 6)
    ref = _torch_reference_run(params, grads, 6)
    for k in params:
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-6, rtol=0)


def test_poly_schedule_values():
    sched = poly_lr_schedule(INITIAL_LR, MAX_EPOCHS, ITERS_PER_EPOCH)
    for step in (0, 1, 2, 5, 19):
        epoch = step // ITERS_PER_EPOCH
        expected = INITIAL_LR * (1.0 - epoch / MAX_EPOCHS) ** 0.9
        assert float(sched(step)) == pytest.approx(expected, rel=1e-6)


def test_clip_norm_semantics_match_torch():
    """clip_by_global_norm must equal torch.nn.utils.clip_grad_norm_:
    scale = min(1, clip/global_norm) over ALL leaves jointly."""
    import optax
    grads = _make_tree(3, 20.0)
    tp = [torch.nn.Parameter(torch.zeros(*v.shape)) for v in grads.values()]
    for p, v in zip(tp, grads.values()):
        p.grad = torch.from_numpy(v.copy())
    torch.nn.utils.clip_grad_norm_(tp, 12.0)
    ref = {k: p.grad.numpy() for k, p in zip(grads, tp)}

    clip = optax.clip_by_global_norm(12.0)
    jg = jax.tree.map(jnp.asarray, grads)
    clipped, _ = clip.update(jg, clip.init(jg), None)
    for k in grads:
        np.testing.assert_allclose(np.asarray(clipped[k]), ref[k], atol=2e-6,
                                   rtol=0)
