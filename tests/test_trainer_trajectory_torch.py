"""Trainer-TRAJECTORY parity vs the reference's ACTUAL trainer loop
(VERDICT r4 missing #2 / next #6) — the top of the parity pyramid
(losses: test_reference_parity, forward: test_model_parity_torch,
optimizer: test_optimizer_parity_torch).

What runs on the torch side is the reference's OWN code, loaded from
``/root/reference/nnunet_ext`` with upstream-nnunet stubs:

  * ``nnUNetTrainerMultiHead.run_iteration``  (multihead/…:598-656) — the
    per-iteration hot loop: forward → DS loss → backward → clip(12) →
    SGD step → ``mh_network.update_after_iteration()`` (a REAL re-split of
    the torch model each iteration, MultiHead_Module.py:139-157)
  * ``nnUNetTrainerEWC.run_iteration`` (ewc/…:232-250) — adds
    ``loss.update_network_params`` per iteration
  * ``nnUNetTrainerEWC.after_train`` (ewc/…:252-310) — the reference's
    fisher pass.  NOTE (documented deviation): the reference zero-grads
    EVERY batch, so its stored fisher is the LAST batch's grad² — not the
    epoch accumulation its comments describe.  Our production
    ``EWCTrainer.after_task`` uses the epoch-average (the documented
    intent); for an apples-to-apples trajectory this test runs our side
    through a subclass whose fisher recipe matches the reference's actual
    code (last batch, no normalization).
  * ``MultipleOutputLossEWC.forward`` (deep_supervision.py:15-83) — the
    real EWC penalty over ``named_parameters``.

Our side is the REAL ``MultiHeadTrainer.train_task`` loop (jitted train
step, Prefetcher, absorb/add_new_task lifecycle) driven by a deterministic
fixed-batch sampler; the torch side replays the identical batch sequence.

Known constant offset: upstream ``SoftDiceLoss`` returns ``-dice`` while
ours returns ``1 - dice`` — with normalized DS weights the total loss
differs by exactly +1.0, asserted as such.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lifelong_nnunet_tpu.models.multihead import flatten  # noqa: E402
from lifelong_nnunet_tpu.ops.losses import ds_weights  # noqa: E402
from lifelong_nnunet_tpu.training.trainer import TrainerOptions  # noqa: E402
from lifelong_nnunet_tpu.training.trainers import EWCTrainer  # noqa: E402
from lifelong_nnunet_tpu.training.trainers.ewc import make_fisher_fn  # noqa: E402

REF = "/root/reference/nnunet_ext"

TASK_A, TASK_B = "Task097_SynthA", "Task098_SynthB"
EPOCHS, ITERS, VAL_ITERS = 2, 5, 1
BATCH, PATCH, IN_CH = 2, (16, 16, 16), 1
LAMBDA = 0.4


# ----------------------------------------------------------- upstream stubs

class _RobustCELoss(tnn.CrossEntropyLoss):
    """Upstream RobustCrossEntropyLoss (stub, 8 upstream lines)."""

    def forward(self, input, target):
        if len(target.shape) == len(input.shape):
            assert target.shape[1] == 1
            target = target[:, 0]
        return super().forward(input, target.long())


class _MultipleOutputLoss2(tnn.Module):
    """Upstream MultipleOutputLoss2 (stub per upstream deep_supervision.py)."""

    def __init__(self, loss, weight_factors=None):
        super().__init__()
        self.weight_factors = weight_factors
        self.loss = loss

    def forward(self, x, y):
        weights = self.weight_factors or [1] * len(x)
        l = weights[0] * self.loss(x[0], y[0])
        for i in range(1, len(x)):
            if weights[i] != 0:
                l = l + weights[i] * self.loss(x[i], y[i])
        return l


class _TorchDCandCE(tnn.Module):
    """Upstream DC_and_CE_loss semantics (dice_loss.py): softmax soft-Dice
    with batch_dice=True, do_bg=False, smooth=1e-5, returning ``-dice``;
    plus RobustCE; aggregate sum."""

    def __init__(self, batch_dice=True, smooth=1e-5):
        super().__init__()
        self.batch_dice = batch_dice
        self.smooth = smooth
        self.ce = _RobustCELoss()

    def forward(self, logits, target):
        ce = self.ce(logits, target)
        probs = torch.softmax(logits, dim=1)
        if target.ndim == logits.ndim:
            t = target[:, 0]
        else:
            t = target
        y = F.one_hot(t.long(), logits.shape[1]).movedim(-1, 1).float()
        axes = [0] + list(range(2, logits.ndim)) if self.batch_dice \
            else list(range(2, logits.ndim))
        tp = (probs * y).sum(dim=axes)
        fp = (probs * (1 - y)).sum(dim=axes)
        fn = ((1 - probs) * y).sum(dim=axes)
        dc = (2 * tp + self.smooth) / (2 * tp + fp + fn + self.smooth)
        dc = dc[1:] if self.batch_dice else dc[:, 1:]
        return ce - dc.mean()


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load(path, name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def refmods():
    """Load the reference trainer + loss modules with upstream stubs."""
    saved = {k: sys.modules.get(k) for k in list(sys.modules)
             if k.startswith("nnunet") or k.startswith("batchgenerators")
             or k.startswith("ref_")}
    ident = lambda t, gpu_id=None: t  # noqa: E731

    import os as _os
    _mod("nnunet")
    _mod("nnunet.utilities")
    _mod("nnunet.utilities.to_torch", maybe_to_torch=ident, to_cuda=ident)
    _mod("nnunet.utilities.nd_softmax",
         softmax_helper=lambda x: torch.softmax(x, 1))
    _mod("nnunet.utilities.tensor_utilities",
         sum_tensor=lambda t, axes, keepdim=False: t.sum(dim=axes,
                                                         keepdim=keepdim))
    _mod("nnunet.network_architecture")
    _mod("nnunet.network_architecture.generic_UNet",
         Generic_UNet=type("Generic_UNet", (tnn.Module,), {}))
    _mod("nnunet.training")
    _mod("nnunet.training.loss_functions")
    _mod("nnunet.training.loss_functions.dice_loss",
         DC_and_CE_loss=_TorchDCandCE)
    _mod("nnunet.training.loss_functions.deep_supervision",
         MultipleOutputLoss2=_MultipleOutputLoss2)
    _mod("nnunet.training.loss_functions.crossentropy",
         RobustCrossEntropyLoss=_RobustCELoss)
    _mod("nnunet.training.network_training")
    _mod("nnunet.training.network_training.nnUNetTrainerV2",
         nnUNetTrainerV2=type("nnUNetTrainerV2", (object,), {}))
    _mod("nnunet.training.data_augmentation")
    _mod("nnunet.training.data_augmentation.data_augmentation_noDA",
         get_no_augmentation=lambda *a, **k: None)
    _mod("nnunet.training.data_augmentation.data_augmentation_moreDA",
         get_moreDA_augmentation=lambda *a, **k: None)
    _mod("nnunet.training.dataloading")
    _mod("nnunet.training.dataloading.dataset_loading",
         load_dataset=None, DataLoader3D=None, DataLoader2D=None,
         unpack_dataset=None)
    _mod("batchgenerators")
    _mod("batchgenerators.utilities")
    _mod("batchgenerators.utilities.file_and_folder_operations",
         join=_os.path.join, isfile=_os.path.isfile, isdir=_os.path.isdir,
         maybe_mkdir_p=lambda p: _os.makedirs(p, exist_ok=True),
         load_pickle=None, save_pickle=None, write_pickle=None,
         subfiles=None, subdirs=None, load_json=None, save_json=None)
    # nnunet_ext stubs for everything the trainer imports but we don't run
    _mod("nnunet_ext")
    _mod("nnunet_ext.paths", default_plans_identifier="nnUNetPlansv2.1",
         evaluation_output_dir="/tmp/ref_eval",
         preprocessing_output_dir="/tmp/ref_pre",
         nnUNet_raw_data="/tmp/ref_raw", nnUNet_cropped_data="/tmp/ref_crop",
         network_training_output_dir="/tmp/ref_results")
    _mod("nnunet_ext.utilities")
    _mod("nnunet_ext.utilities.helpful_functions")
    _mod("nnunet_ext.training")
    _mod("nnunet_ext.training.model_restore", restore_model=None,
         recursive_find_python_class_file=None)
    _mod("nnunet_ext.run")
    _mod("nnunet_ext.run.default_configuration",
         get_default_configuration=None)
    _mod("nnunet_ext.network_architecture")
    _mod("nnunet_ext.network_architecture.generic_ViT_UNet",
         Generic_ViT_UNet=type("Generic_ViT_UNet", (tnn.Module,), {}))
    _mod("nnunet_ext.training.network_training")
    _mod("nnunet_ext.training.network_training.nnViTUNetTrainer",
         nnViTUNetTrainer=type("nnViTUNetTrainer", (object,), {}))
    _mod("nnunet_ext.training.network_training.multihead")
    _mod("nnunet_ext.training.network_training.ewc")
    _mod("nnunet_ext.training.loss_functions")

    # real reference code under its canonical module names
    mh_mod = _load(f"{REF}/network_architecture/MultiHead_Module.py",
                   "nnunet_ext.network_architecture.MultiHead_Module")
    _load(f"{REF}/training/loss_functions/crossentropy.py",
          "nnunet_ext.training.loss_functions.crossentropy")
    _load(f"{REF}/training/loss_functions/embeddings.py",
          "nnunet_ext.training.loss_functions.embeddings")
    _load(f"{REF}/training/loss_functions/knowledge_distillation.py",
          "nnunet_ext.training.loss_functions.knowledge_distillation")
    ds_mod = _load(f"{REF}/training/loss_functions/deep_supervision.py",
                   "nnunet_ext.training.loss_functions.deep_supervision")
    tr_mod = _load(
        f"{REF}/training/network_training/multihead/nnUNetTrainerMultiHead.py",
        "nnunet_ext.training.network_training.multihead."
        "nnUNetTrainerMultiHead")
    ewc_mod = _load(
        f"{REF}/training/network_training/ewc/nnUNetTrainerEWC.py",
        "nnunet_ext.training.network_training.ewc.nnUNetTrainerEWC")
    yield types.SimpleNamespace(mh=mh_mod, ds=ds_mod, tr=tr_mod, ewc=ewc_mod)
    for k in [k for k in sys.modules
              if k.startswith("nnunet") or k.startswith("batchgenerators")
              or k.startswith("ref_")]:
        del sys.modules[k]
    sys.modules.update({k: v for k, v in saved.items() if v is not None})


# ------------------------------------------------------------ fixed batches

class FixedSampler:
    """Deterministic synthetic batch stream keyed by (task, train, offset).
    Both frameworks replay the identical sequence by construction."""

    def __init__(self, task: str, train: bool, seed_offset: int):
        import zlib
        key = f"{task}|{bool(train)}|{int(seed_offset)}".encode()
        self.rng = np.random.RandomState(zlib.crc32(key) & 0x7FFFFFFF)

    def next_batch(self):
        data = self.rng.normal(
            size=(BATCH,) + PATCH + (IN_CH,)).astype(np.float32)
        # blobby 3-class targets correlated with the data so Dice moves
        seg = (data[..., 0] > 0.6).astype(np.int64) \
            + 2 * (data[..., 0] < -0.9).astype(np.int64)
        return {"data": data, "seg": seg}


class _TrajectoryEWC(EWCTrainer):
    """Our REAL trainer loop, with (a) the fixed-batch sampler and (b) a
    fisher recipe aligned to the reference's ACTUAL after_train code
    (last-batch grad², no normalization — see module docstring).  The
    production after_task (epoch-average fisher) is the documented-intent
    variant and is covered by test_cl_trainers."""

    def register_task_data(self, task, stage_dir):
        self._datasets[task] = (None, [], [])

    def _make_sampler(self, task, train=True, seed_offset=0):
        return FixedSampler(task, train, seed_offset)

    def after_task(self, task):
        self.mh = self.mh.absorb(self.state.params, task)
        params = self.state.params
        flat = flatten(params)
        fisher0 = {k: jnp.zeros_like(v, jnp.float32) for k, v in flat.items()}
        fisher_step = make_fisher_fn(self.model, self.ds_factors,
                                     self.batch_dice, augment=None)
        sampler = self._make_sampler(task, train=True, seed_offset=777)
        batch = None
        for _ in range(self.opts.iters_per_epoch):
            batch = sampler.next_batch()
        fisher = fisher_step(params, fisher0,
                             {"data": jnp.asarray(batch["data"]),
                              "seg": jnp.asarray(batch["seg"])},
                             jax.random.PRNGKey(0))
        self.cl_state["ewc_tasks"][task] = {"fisher": fisher,
                                            "params": dict(flat)}


# ------------------------------------------------------------- torch driver

def _torch_gen(sampler: FixedSampler, ds_factors, n_out):
    """Replay FixedSampler batches in the reference's generator format:
    channels-second data, per-DS-level target list (identical strided
    downsampling to ops/losses.ds_targets)."""
    while True:
        b = sampler.next_batch()
        data = torch.from_numpy(np.moveaxis(b["data"], -1, 1).copy())
        targets = []
        for fac in list(ds_factors)[:n_out]:
            t = b["seg"][(slice(None),) + tuple(slice(None, None, int(f))
                                                for f in fac)]
            targets.append(torch.from_numpy(t[:, None].astype(np.float32)))
        yield {"data": data, "target": targets}


def _poly_lr(step):
    epoch = step // ITERS
    return 1e-2 * (1.0 - epoch / EPOCHS) ** 0.9


def _make_shim(trainer_cls, network, optimizer, loss, mh_network):
    tr = object.__new__(trainer_cls)
    tr.fp16 = False
    tr.network = network
    tr.optimizer = optimizer
    tr.loss = loss
    tr.mh_network = mh_network
    tr.print_to_log_file = lambda *a, **k: None
    return tr


def _run_task_torch(refmods, trainer_cls, mh_torch, task, loss, ds_factors,
                    n_out, losses_out):
    """One task's training on the torch side via the reference's OWN
    run_iteration, with fresh SGD + per-epoch poly LR like upstream."""
    mh_torch.assemble_model(task)
    net = mh_torch.model
    opt = torch.optim.SGD(net.parameters(), lr=1e-2, momentum=0.99,
                          nesterov=True, weight_decay=3e-5)
    shim = _make_shim(trainer_cls, net, opt, loss, mh_torch)
    gen = _torch_gen(FixedSampler(task, True, len(mh_torch.heads)),
                     ds_factors, n_out)
    for step in range(EPOCHS * ITERS):
        for g in opt.param_groups:
            g["lr"] = _poly_lr(step)
        l = shim.run_iteration(gen)
        losses_out.append(float(l))
    return shim


# -------------------------------------------------------------------- test

@pytest.fixture(scope="module")
def tiny_plans(synthetic_task, tmp_path_factory):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    return plan_experiment(analyze_dataset(synthetic_task))


def test_two_task_ewc_trajectory_matches_reference(refmods, tiny_plans,
                                                   tmp_path):
    opts = TrainerOptions(num_epochs=EPOCHS, iters_per_epoch=ITERS,
                          val_iters=VAL_ITERS, save_every=50, batch_size=BATCH,
                          patch_size=PATCH, augment=False,
                          use_progress_val=False, dtype="float32",
                          base_num_features=4, max_num_features=16)
    ours = _TrajectoryEWC(tiny_plans, "3d_fullres", str(tmp_path / "run"),
                          opts, ewc_lambda=LAMBDA)
    ours._ensure_initialized(TASK_A)
    n_out = ours.model.num_pool
    ds_factors = ours.ds_factors
    w = [float(x) for x in ds_weights(n_out)]

    # torch mirror of the identical initial weights
    from tests.test_model_parity_torch import TorchGenericUNet
    params0 = jax.tree_util.tree_map(np.asarray, ours.mh.assemble(TASK_A))
    tnet = TorchGenericUNet(ours.model, params0, IN_CH)
    mh_torch = refmods.mh.MultiHead_Module(
        TorchGenericUNet, split_at="seg", task=TASK_A, prev_trainer=tnet)

    # ---- task A: plain MultiHead loop (reference run_iteration) ----
    torch_losses_a: list = []
    base = _MultipleOutputLoss2(_TorchDCandCE(batch_dice=ours.batch_dice), w)
    shim_a = _run_task_torch(refmods, refmods.tr.nnUNetTrainerMultiHead,
                             mh_torch, TASK_A, base, ds_factors, n_out,
                             torch_losses_a)

    ours.train_task(TASK_A, "unused")
    jax_losses_a = [e["tr_loss"] for e in ours._epoch_log
                    if e["task"] == TASK_A]

    # per-epoch mean loss parity with the documented +1.0 Dice offset
    ta = np.asarray(torch_losses_a).reshape(EPOCHS, ITERS).mean(1) + 1.0
    np.testing.assert_allclose(np.asarray(jax_losses_a), ta, rtol=5e-3,
                               atol=5e-3)

    # ---- reference after_train (REAL code): fisher = last-batch grad² ----
    shim_a.num_batches_per_epoch = ITERS
    shim_a.tr_gen = _torch_gen(FixedSampler(TASK_A, True, 777), ds_factors,
                               n_out)
    shim_a.task = TASK_A
    shim_a.fisher = {TASK_A: {}}
    shim_a.params = {TASK_A: {}}
    # the coarsest seg head has DS weight 0 -> grad None; the reference's
    # fallback hard-codes ``torch.tensor([1], device='cuda:0')`` (it assumes
    # a GPU) — shim the device, keep the reference's fisher=1 semantics.
    # (Those params never move — torch SGD skips None-grad params — so their
    # penalty term is identically 0 on both sides regardless of fisher.)
    orig_tensor = torch.tensor

    def _cpu_tensor(*a, **k):
        if k.get("device") == "cuda:0":
            k["device"] = "cpu"
        return orig_tensor(*a, **k)

    torch.tensor = _cpu_tensor
    try:
        refmods.ewc.nnUNetTrainerEWC.after_train(shim_a)
    finally:
        torch.tensor = orig_tensor
    fisher_t = shim_a.fisher[TASK_A]
    params_t = shim_a.params[TASK_A]
    assert fisher_t and all(torch.isfinite(v).all()
                            for v in fisher_t.values())

    # ---- task B: EWC penalty active on both sides ----
    mh_torch.add_new_task(TASK_B, use_init=True)
    ewc_loss = refmods.ds.MultipleOutputLossEWC(
        _TorchDCandCE(batch_dice=ours.batch_dice), w, ewc_lambda=LAMBDA,
        fisher=shim_a.fisher, params=shim_a.params,
        network_params=None)
    torch_losses_b: list = []
    mh_torch.assemble_model(TASK_B)
    ewc_loss.update_network_params(mh_torch.model.named_parameters())
    shim_b = _run_task_torch(refmods, refmods.ewc.nnUNetTrainerEWC,
                             mh_torch, TASK_B, ewc_loss, ds_factors, n_out,
                             torch_losses_b)
    del shim_b

    ours.train_task(TASK_B, "unused")
    jax_losses_b = [e["tr_loss"] for e in ours._epoch_log
                    if e["task"] == TASK_B]
    tb = np.asarray(torch_losses_b).reshape(EPOCHS, ITERS).mean(1) + 1.0
    np.testing.assert_allclose(np.asarray(jax_losses_b), tb, rtol=8e-3,
                               atol=8e-3)

    # EWC penalty actually fired on both sides (nonzero by step 2)
    probe = FixedSampler("probe", True, 0).next_batch()
    flat = flatten(ours.state.params)
    from lifelong_nnunet_tpu.ops.cl_losses import ewc_penalty
    pen = float(ewc_penalty(flat, ours.cl_state["ewc_tasks"], LAMBDA))
    assert np.isfinite(pen) and pen > 0

    # ---- end-state parity: full forward on a probe batch ----
    jax_out = ours.model.apply({"params": ours.mh.assemble(TASK_B)},
                               jnp.asarray(probe["data"]))
    mh_torch.assemble_model(TASK_B)
    mh_torch.model.eval()
    with torch.no_grad():
        t_out = mh_torch.model(
            torch.from_numpy(np.moveaxis(probe["data"], -1, 1).copy()))
    for i, (jo, to) in enumerate(zip(jax_out, t_out)):
        to_cl = to.numpy().transpose((0, 2, 3, 4, 1))
        np.testing.assert_allclose(np.asarray(jo), to_cl, atol=5e-2,
                                   rtol=5e-2, err_msg=f"DS output {i} after "
                                   f"{2 * EPOCHS * ITERS} parity steps")
    # trajectories agree step-for-step => Dice trajectories agree; the
    # remaining delta after 20 cross-framework steps is conv-algorithm
    # accumulation noise, bounded above.
