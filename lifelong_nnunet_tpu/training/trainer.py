"""MultiHeadTrainer — the base continual-learning trainer.

Counterpart of the reference's ``nnUNetTrainerMultiHead``
(``nnunet_ext/training/network_training/multihead/nnUNetTrainerMultiHead.py``,
1408 LoC): owns the multi-head network state, the task lifecycle, the
``already_trained_on`` manifest, epoch loop, checkpointing, and periodic
cross-task validation.  CL methods subclass it and override only the four
hooks (``init_cl_state`` / ``loss_extras`` / ``cl_state_update`` /
``before_task`` / ``after_task``) plus ``HYPERPARAMS`` — the per-iteration
math lives in ``ops/cl_losses.py``, compiled into the single jitted train
step (SURVEY.md §7.2).

Key design translations from the reference:
  * ``mh_network.update_after_iteration()`` every iteration (``:649-650``) →
    nothing: the optimizer updates the merged param tree; ``absorb`` writes
    back into the head registry at epoch/task boundaries only.
  * per-epoch AMP + grad clip → bf16 compute inside one jitted step.
  * ``_perform_validation`` (``:678-901``) patch-sampled per-subject eval →
    full sliding-window per-subject eval on the preprocessed volumes
    (deterministic, no sampling noise; shapes bucketed for compile reuse).
  * 250/50 train/val iterations per epoch, poly LR, SGD nesterov 0.99,
    save_every=25 — same defaults.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import AugmentConfig
from ..data.dataset import PreprocessedDataset, kfold_split, param_search_split
from ..data.pipeline import Prefetcher
from ..data.sampler import PatchSampler
from ..inference.sliding_window import predict_sliding_window
from ..models.multihead import MultiHeadParams
from ..models.unet import ds_scale_factors, unet_from_plans
from ..training import checkpoints
from ..training.optimizer import make_optimizer
from ..training.train_step import StepConfig, TrainState, make_eval_step, make_train_step
from ..utilities.logging_utils import RunLogger


@dataclass
class TrainerOptions:
    num_epochs: int = 1000
    iters_per_epoch: int = 250
    val_iters: int = 50
    save_every: int = 25
    initial_lr: float = 1e-2
    split_at: str = "seg_outputs"
    batch_size: int | None = None          # None -> plans value
    patch_size: tuple | None = None        # None -> plans value
    dtype: str = "bfloat16"                # compute dtype on TPU
    augment: bool = True
    oversample: float = 0.33
    seed: int = 0
    fold: int = 0
    use_param_split: bool = False          # param-search 80:20 split
    use_progress_val: bool = False         # _perform_validation every save_every
    # periodic-validation mode: "sliding_window" (ours — full-volume metrics)
    # or "patches" (the reference's patch-sampled periodic val,
    # multihead/nnUNetTrainerMultiHead.py:678-901 — random oversampled val
    # patches, per-subject tp/fp/fn accumulated across draws; metric values
    # are 1:1 comparable with the reference's val_metrics.json during
    # training).  Final evaluation always uses sliding-window.
    val_mode: str = "sliding_window"
    mixed_precision_on_cpu: bool = False   # tests force f32 on CPU
    base_num_features: int | None = None   # None -> plans value (tests shrink this)
    max_num_features: int | None = None
    # ViT backbone (Generic_ViT_UNet) flags — reference nnViTUNetTrainer.py:38-58
    # SPMD scale-out: shard the batch over this many devices (data parallel;
    # params replicated — GSPMD inserts the gradient all-reduce over ICI).
    # None/1 = single device.  SURVEY.md §2.7: replaces the absent DDP.
    n_devices: int | None = None
    # shard conv/dense output-feature dims over this many of the n_devices
    # (mesh = data × model; GSPMD inserts the activation collectives over
    # ICI).  Replaces the reference's manual 2-GPU split_gpu placement of the
    # ViT (generic_ViT_UNet.py:239-257) and frees HBM for ViT-large/huge.
    model_parallel: int = 1
    # route eligible low-channel conv stages (3^3, stride 1, C<=64, bf16,
    # TPU, width % 128 == 0) through the fused Pallas conv+IN+LReLU kernel.
    # None = auto (the default): ON for TPU training, same as inference —
    # measured 1.21x on the CT train step with an identical loss trajectory
    # and XLA-matching gradients (RESULTS.md round 2); the routing gates are
    # shape/backend-aware so CPU and fp32 runs are unaffected. Opt out with
    # LNN_PALLAS_CONV=0 (or pallas_conv=False).
    pallas_conv: bool | None = None
    # write a jax.profiler trace of the first training epoch to this dir
    # (SURVEY.md §5: the reference has no profiler; we make one first-class)
    profile_dir: str | None = None
    remat: bool = False                    # rematerialize conv stages (big patches)
    use_vit: bool = False
    vit_version: str = "V1"
    vit_type: str = "base"
    vit_lsa: bool = False
    vit_spt: bool = False
    vit_task_specific_ln: bool = False
    vit_depth_override: int | None = None  # tests shrink the transformer


class MultiHeadTrainer:
    EXTENSION = "multihead"
    HYPERPARAMS: dict = {}
    # Sequential-style trainers transfer the previous head to new tasks
    TRANSFER_HEADS = False

    def __init__(self, plans, config_name: str, output_folder: str,
                 options: TrainerOptions | None = None, **hyperparams):
        self.plans = plans
        self.config_name = config_name
        self.cfg = plans.config(config_name)
        self.output_folder = output_folder
        self.opts = options or TrainerOptions()
        self.hyperparams = hyperparams
        self.num_classes = plans.num_classes + 1
        # nnU-Net batch-dice rule (reference default_configuration.py:93-100):
        # 2d & 3d_fullres use batch dice; 3d_lowres (cascade) does not.
        self.batch_dice = config_name in ("2d", "3d_fullres")

        dtype = jnp.float32
        if self.opts.dtype == "bfloat16" and (
                jax.default_backend() != "cpu" or self.opts.mixed_precision_on_cpu):
            dtype = jnp.bfloat16
        if self.opts.use_vit:
            from ..models.vit_unet import vit_unet_from_plans
            self.model = vit_unet_from_plans(
                plans, config_name, dtype=dtype, vit_version=self.opts.vit_version,
                vit_type=self.opts.vit_type, lsa=self.opts.vit_lsa,
                spt=self.opts.vit_spt)
            if self.opts.vit_depth_override:
                d = self.opts.vit_depth_override
                self.model = self.model.clone(vit_depth=d, vit_embed_dim=max(16, 8 * d),
                                              vit_heads=2)
        else:
            self.model = unet_from_plans(plans, config_name, dtype=dtype)
        if self.opts.remat:
            self.model = self.model.clone(remat=True)
        use_pallas = self.opts.pallas_conv
        if use_pallas is None:  # auto: default-on, LNN_PALLAS_CONV=0 opts out
            use_pallas = os.environ.get("LNN_PALLAS_CONV", "1") != "0"
        if use_pallas and hasattr(self.model, "pallas_conv"):
            # fused Pallas conv+IN+LReLU for eligible low-channel stages
            # (custom VJP reuses the kernel for dx) — ops/pallas/conv3d.py
            self.model = self.model.clone(pallas_conv=True)
        if os.environ.get("LNN_BLOCKED_CONV", "0") == "1" \
                and hasattr(self.model, "blocked_conv"):
            # DMA-packed fast-regime conv for big-volume C<=64 stages
            # (differentiable, custom VJP) — ops/pallas/block_pack.py;
            # opt-in until chip-measured e2e
            self.model = self.model.clone(blocked_conv=True)
        if os.environ.get("LNN_CONV25D", "1") != "0" \
                and hasattr(self.model, "conv25d"):
            # 2.5D decomposition for big-volume C<=64 stages (ops/conv25d):
            # plain lax, differentiable; only fires on stride-1 items with
            # >=256k voxels (64^3 up) and N*D>=64 (ops/conv25d.eligible),
            # so small-patch training (hippocampus-scale) is untouched
            self.model = self.model.clone(conv25d=True)
        if self.opts.base_num_features or self.opts.max_num_features:
            self.model = self.model.clone(
                base_num_features=self.opts.base_num_features or self.model.base_num_features,
                max_num_features=self.opts.max_num_features or self.model.max_num_features)
        self.ds_factors = tuple(ds_scale_factors(self.cfg.pool_op_kernel_sizes))
        self.patch_size = tuple(self.opts.patch_size or self.cfg.patch_size)
        self.batch_size = int(self.opts.batch_size or self.cfg.batch_size)
        if self.opts.use_vit:
            # ViT batch-size halving (reference multihead/…:283-292)
            self.batch_size = max(1, self.batch_size // 2)

        # input channels: modalities (+ one-hot prev-stage seg for cascade)
        self.in_channels = plans.num_modalities
        self.mh: MultiHeadParams | None = None
        self.state: TrainState | None = None
        self.cl_state = self.init_cl_state()
        self.tx = None
        self._train_step = None
        self._eval_step = None
        self.epoch = 0
        self.global_step = 0
        self.best_val = np.inf
        self.already_trained_on: dict = {}
        # metadata (trained_on manifest) lives in a stable folder even when the
        # orchestrator moves output_folder per task (reference keeps a sibling
        # metadata/ tree, multihead/…:1315-1361)
        self.metadata_folder = output_folder
        self.logger = RunLogger(output_folder)
        self.rng = jax.random.PRNGKey(self.opts.seed)
        self._datasets: dict = {}     # task -> (PreprocessedDataset, tr_cases, val_cases)
        self._prefetcher = None
        self._val_history: list = []
        # per-epoch curves for the progress plot (upstream plots progress.png)
        self._epoch_log: list = []    # dicts: task, epoch, tr_loss, val_loss, val_dice

    # ------------------------------------------------------------------ hooks
    def init_cl_state(self):
        return {}

    def loss_extras(self):
        """Return a callable (params, cl_state, model_out, batch) ->
        (extra_loss, aux dict), or None. ``model_out`` = {'outputs', 'taps'}."""
        return None

    def cl_state_update(self):
        """Return a callable (cl_state, params, grads, loss) -> cl_state, or None."""
        return None

    def before_task(self, task: str):
        pass

    def after_task(self, task: str):
        pass

    def trainable_mask(self):
        """Override for frozen-* methods. None = everything trainable."""
        return None

    def _wrap_params(self, assembled):
        """Map the assembled (body+active-head) tree to the train-step param
        tree. LwF wraps in {'main', 'prev_heads'} so previous heads train."""
        return assembled

    def extra_manifest(self) -> dict:
        """Per-trainer additions to the checkpoint manifest (LwF records its
        training phase here so ``-c`` resumes into the right phase)."""
        return {}

    def _adopt_manifest(self, manifest: dict):
        """Hook: adopt trainer-specific manifest fields during
        ``load_checkpoint`` (before the train step is rebuilt)."""

    def _unwrap_params(self, step_params):
        """Inverse of _wrap_params: full nested tree for absorb/eval."""
        return step_params

    # -------------------------------------------------------------- data
    def register_task_data(self, task: str, stage_dir: str):
        ds = PreprocessedDataset(stage_dir)
        fold = self.opts.fold
        if fold == -1 or fold == "all":
            tr, val = list(ds.cases), list(ds.cases)
        else:
            # splits_final.json in the task dir (user-editable, upstream
            # nnU-Net convention); computed via kfold_split on first use
            from ..data.dataset import final_splits
            splits = final_splits(os.path.dirname(stage_dir), ds.cases)
            s = splits[fold % len(splits)]
            tr, val = list(s["train"]), list(s["val"])
        if self.opts.use_param_split:
            tr, val = param_search_split(tr)
        self._datasets[task] = (ds, tr, val)
        return tr, val

    def _make_sampler(self, task: str, train: bool = True, seed_offset: int = 0):
        ds, tr, val = self._datasets[task]
        cases = tr if train else val
        # multi-host SPMD: each process samples only its contiguous slice of
        # the global batch (the Prefetcher assembles the global jax.Array);
        # single-host runs are shard (0, 1) == unchanged
        from ..data.sampler import input_shard
        return PatchSampler(ds, cases, self.patch_size, self.batch_size,
                            oversample_foreground_percent=self.opts.oversample,
                            seed=self.opts.seed + seed_offset + (0 if train else 1000),
                            shard=input_shard())

    # -------------------------------------------------------------- setup
    def _ensure_initialized(self, task: str):
        if self.mh is not None:
            return
        dummy = jnp.zeros((1,) + self.patch_size + (self.in_channels,),
                          jnp.float32)
        params = self.model.init(jax.random.PRNGKey(self.opts.seed), dummy)["params"]
        self.mh = MultiHeadParams.create(params, self.opts.split_at,
                                         self.model.module_order(), task)
        self.logger(f"initialized network: {sum(x.size for x in jax.tree.leaves(params)):,} params, "
                    f"patch {self.patch_size}, batch {self.batch_size}")

    def _build_step(self):
        self.tx = make_optimizer(
            max_epochs=self.opts.num_epochs,
            iters_per_epoch=self.opts.iters_per_epoch,
            initial_lr=self.opts.initial_lr,
            trainable_mask=self.trainable_mask(),
        )
        aug = AugmentConfig(dummy_2d=getattr(self.cfg, "do_dummy_2d_aug", False)) \
            if self.opts.augment else None
        step_cfg = StepConfig(ds_factors=self.ds_factors, batch_dice=self.batch_dice,
                              num_classes=self.num_classes, augment=aug)
        self._train_step = make_train_step(self.model, self.tx, step_cfg,
                                           loss_extras=self.loss_extras(),
                                           cl_state_update=self.cl_state_update())
        self._eval_step = make_eval_step(self.model, step_cfg)
        params = self._setup_spmd(self._wrap_params(self.mh.assemble()))
        self.state = TrainState.create(params, self.tx)
        # mid-task resume: adopt the state (params + optimizer momentum)
        # restored by load_checkpoint instead of the fresh one
        self._adopt_resume_state()

    def _setup_spmd(self, params):
        """Place params on the device mesh (data × model axes) and prepare the
        batch shardings; identity on a single device."""
        self._batch_shardings = None
        n_dev = self.opts.n_devices
        if n_dev and n_dev > 1:
            import jax as _jax
            from ..parallel.mesh import (batch_sharding, make_mesh,
                                         param_shardings, replicated)
            if len(_jax.devices()) < n_dev:
                raise RuntimeError(f"n_devices={n_dev} but only "
                                   f"{len(_jax.devices())} devices visible")
            mp = max(1, self.opts.model_parallel)
            if n_dev % mp:
                raise RuntimeError(f"model_parallel={mp} must divide n_devices={n_dev}")
            dp = n_dev // mp
            if self.batch_size % dp:
                # round the batch up so it shards evenly
                self.batch_size = -(-self.batch_size // dp) * dp
            mesh = make_mesh(n_dev, data_parallel=dp, axis_names=("data", "model"))
            if mp > 1:
                # 2-axis SPMD: kernels shard their output-feature dim over
                # 'model'; GSPMD propagates matching activation shardings
                params = jax.tree.map(jax.device_put, params,
                                      param_shardings(params, mesh))
            else:
                rep = replicated(mesh)
                params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
            dim = 2 + len(self.patch_size)
            self._batch_shardings = {
                "data": batch_sharding(mesh, dim),
                "seg": batch_sharding(mesh, dim - 1),
            }
            self.logger(f"SPMD: mesh data={dp} x model={mp}, batch {self.batch_size}")
        return params

    def _adopt_resume_state(self):
        resume = getattr(self, "_resume_state", None)
        if resume is not None:
            try:
                jax.tree.map(lambda a, b: None, resume.params, self.state.params)
                self.state = resume
            except ValueError:
                self.logger("resume state structure mismatch — starting fresh optimizer")
            self._resume_state = None

    def _maybe_update_vit_task_lns(self, task: str):
        """Task-specific ViT LayerNorms: extend the static ``ln_tasks`` tuple
        and activate this task's LNs (reference ``register_new_task`` /
        ``use_task``, vision_transformer.py:380-416).  New LN params are
        freshly initialized; all other leaves are carried over."""
        if not (self.opts.use_vit and self.opts.vit_task_specific_ln):
            return
        from ..models.multihead import flatten as _flat, split_params, unflatten as _unflat
        tasks = tuple(self.mh.tasks)
        idx = tasks.index(task)
        if getattr(self.model, "ln_tasks", ()) == tasks \
                and getattr(self.model, "active_task_idx", 0) == idx:
            return
        self.model = self.model.clone(ln_tasks=tasks, active_task_idx=idx)
        dummy = jnp.zeros((1,) + self.patch_size + (self.in_channels,),
                          jnp.float32)
        fresh = _flat(self.model.init(jax.random.PRNGKey(self.opts.seed + idx),
                                      dummy)["params"])
        old = _flat(self.mh.assemble(task))
        merged = {k: old.get(k, v) for k, v in fresh.items()}
        body, head = split_params(_unflat(merged), self.mh.split_at,
                                  self.model.module_order())
        from dataclasses import replace as _replace
        heads = dict(self.mh.heads)
        heads[task] = head
        from collections import OrderedDict as _OD
        self.mh = _replace(self.mh, body=body,
                           heads=_OD((t, heads[t]) for t in self.mh.tasks),
                           module_order=self.model.module_order())
        self.logger(f"[{task}] ViT task-specific LNs active (idx {idx}, "
                    f"{len(tasks)} task LN sets)")

    # -------------------------------------------------------------- manifest
    def set_output_folder(self, folder: str):
        """Redirect checkpoints/logs for the next task (reference builds a new
        per-task output path each task, run_training.py:528-537)."""
        os.makedirs(folder, exist_ok=True)
        self.output_folder = folder
        self.logger = RunLogger(folder)

    def _trained_on_path(self) -> str:
        os.makedirs(self.metadata_folder, exist_ok=True)
        return os.path.join(self.metadata_folder, f"{self.EXTENSION}_trained_on.json")

    def _update_manifest(self, **kv):
        self.already_trained_on.setdefault(str(self.opts.fold), {
            "finished_training_on": [], "start_training_on": None,
            "finished_validation_on": [], "prev_trainer": [],
            "used_identifier": self.plans.plans_name,
            "checkpoint_should_exist": False,
            "tasks_at_time_of_checkpoint": [],
            "active_task_at_time_of_checkpoint": None,
            "hyperparams": {k: str(v) for k, v in self.hyperparams.items()},
        })
        self.already_trained_on[str(self.opts.fold)].update(kv)
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # multi-host: host 0 owns the shared metadata file
        with open(self._trained_on_path(), "w") as f:
            json.dump(self.already_trained_on, f, indent=2)

    # -------------------------------------------------------------- training
    def train_task(self, task: str, stage_dir: str, num_epochs: int | None = None,
                   start_epoch: int = 0):
        """Train on one task (the reference's per-task ``run_training``,
        ``multihead/…:520-596``): register data, add/activate head, epoch loop,
        checkpoints, manifest updates, after-task CL hook.  ``start_epoch``
        continues an interrupted task from a restored ``model_latest``."""
        num_epochs = num_epochs or self.opts.num_epochs
        self.register_task_data(task, stage_dir)
        self._ensure_initialized(task)
        if task not in self.mh.tasks:
            self.mh = self.mh.add_new_task(task, use_init=not self.TRANSFER_HEADS)
        else:
            self.mh = self.mh.add_new_task(task)  # activate existing head
        self._maybe_update_vit_task_lns(task)
        self.before_task(task)
        self._build_step()
        self._update_manifest(start_training_on=task, checkpoint_should_exist=False)

        # 'before_training' checkpoint: evaluator2's -evaluate_initialization
        # compares against the model before this task's training (reference
        # evaluator2.py:111-240). Multi-phase trainers (LwF) suppress the
        # overwrite in later phases; a mid-task resume (start_epoch > 0) must
        # also not clobber it with mid-task params.
        if not (getattr(self, "_skip_before_ckpt", False) or start_epoch):
            self.save_checkpoint("before_training")
        sampler = self._make_sampler(task, train=True, seed_offset=len(self.mh.tasks))
        prefetch = Prefetcher(sampler, sharding=self._batch_shardings)
        val_sampler = self._make_sampler(task, train=False, seed_offset=len(self.mh.tasks))
        try:
            for epoch in range(start_epoch, num_epochs):
                self.epoch = epoch
                t0 = time.time()
                if epoch == 0 and self.opts.profile_dir:
                    jax.profiler.start_trace(self.opts.profile_dir)
                tr_losses = []
                for _ in range(self.opts.iters_per_epoch):
                    batch, _keys = prefetch.next()
                    self.rng, step_key = jax.random.split(self.rng)
                    self.state, self.cl_state, metrics = self._train_step(
                        self.state, self.cl_state, batch, step_key)
                    tr_losses.append(metrics["loss"])
                    self.global_step += 1
                if epoch == 0 and self.opts.profile_dir:
                    jax.profiler.stop_trace()
                    self.logger(f"profiler trace -> {self.opts.profile_dir}")
                tr_loss = float(jnp.mean(jnp.stack(tr_losses)))
                val_loss, val_dice = self._quick_val(val_sampler)
                self.logger(f"[{task}] epoch {epoch}: train {tr_loss:.4f} "
                            f"val {val_loss:.4f} fg-dice {val_dice:.4f} "
                            f"({time.time()-t0:.1f}s)")
                self._epoch_log.append({"task": task, "epoch": epoch,
                                        "tr_loss": tr_loss, "val_loss": val_loss,
                                        "val_dice": val_dice})
                self.mh = self.mh.absorb(self._unwrap_params(self.state.params), task)
                if val_loss < self.best_val:
                    self.best_val = val_loss
                    self.save_checkpoint("model_best")
                if (epoch + 1) % self.opts.save_every == 0 or epoch == num_epochs - 1:
                    self.save_checkpoint("model_latest")
                    self._plot_progress()
                    self._update_manifest(checkpoint_should_exist=True,
                                          tasks_at_time_of_checkpoint=self.mh.tasks,
                                          active_task_at_time_of_checkpoint=task)
                    if self.opts.use_progress_val:
                        self._perform_validation(tag=f"epoch_{epoch}")
        finally:
            prefetch.stop()
        self.mh = self.mh.absorb(self._unwrap_params(self.state.params), task)
        if getattr(self, "_suppress_finalize", False):
            return  # intermediate phase (e.g. LwF freeze_run): no task-finish bookkeeping
        self.after_task(task)
        self.save_checkpoint("model_final_checkpoint")
        fold_state = self.already_trained_on.get(str(self.opts.fold), {})
        done = fold_state.get("finished_training_on", [])
        val_done = fold_state.get("finished_validation_on", [])
        self._update_manifest(finished_training_on=done + [task], start_training_on=None,
                              finished_validation_on=val_done + [task],
                              checkpoint_should_exist=True,
                              tasks_at_time_of_checkpoint=self.mh.tasks,
                              active_task_at_time_of_checkpoint=task)

    def _quick_val(self, val_sampler):
        losses, tps, fps, fns = [], 0, 0, 0
        eval_params = self._unwrap_params(self.state.params)
        for _ in range(self.opts.val_iters):
            b = val_sampler.next_batch()
            m = self._eval_step(eval_params,
                                {"data": jnp.asarray(b["data"]), "seg": jnp.asarray(b["seg"])})
            losses.append(m["loss"])
            tps = tps + m["tp"]; fps = fps + m["fp"]; fns = fns + m["fn"]
        dice = float(jnp.mean(2 * tps / jnp.maximum(2 * tps + fps + fns, 1)))
        return float(jnp.mean(jnp.stack(losses))), dice

    def _plot_progress(self):
        """progress.png with loss + dice curves (upstream nnU-Net parity,
        SURVEY.md §5 'upstream plots progress PNG')."""
        if not self._epoch_log:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            xs = range(len(self._epoch_log))
            fig, ax1 = plt.subplots(figsize=(9, 5))
            ax1.plot(xs, [e["tr_loss"] for e in self._epoch_log], label="train loss")
            ax1.plot(xs, [e["val_loss"] for e in self._epoch_log], label="val loss")
            ax1.set_xlabel("epoch (cumulative over tasks)")
            ax1.set_ylabel("loss")
            ax2 = ax1.twinx()
            ax2.plot(xs, [e["val_dice"] for e in self._epoch_log], color="green",
                     linestyle="--", label="val fg dice")
            ax2.set_ylabel("dice")
            # task boundaries
            prev = None
            for i, e in enumerate(self._epoch_log):
                if e["task"] != prev:
                    ax1.axvline(i, color="gray", alpha=0.3)
                    prev = e["task"]
            ax1.legend(loc="upper left")
            fig.tight_layout()
            fig.savefig(os.path.join(self.output_folder, "progress.png"), dpi=90)
            plt.close(fig)
        except Exception as e:  # plotting must never kill training
            self.logger(f"progress plot failed: {e}")

    # -------------------------------------------------------------- validation
    def _perform_validation(self, tasks: list | None = None, use_head: str | None = None,
                            always_use_last_head: bool = False, tag: str = "",
                            call_for_eval: bool = False,
                            mirror_axes: tuple | None = None) -> dict:
        """Cross-task per-subject Dice/IoU (reference ``:678-901``): for every
        trained task (or the given list), run sliding-window inference on that
        task's validation cases with the matching head (or ``use_head``),
        write results to val_metrics.json/csv.

        ``mirror_axes=None`` resolves to full TTA mirroring for evaluation
        calls (matching inference/evaluator2 defaults, so Evaluator and
        evaluator2 metrics are comparable) and to no TTA for the cheap
        periodic in-training validation (the reference's periodic
        ``_perform_validation`` is likewise a patch eval without mirroring;
        its final ``validate()`` mirrors)."""
        if mirror_axes is None:
            mirror_axes = (0, 1, 2) if call_for_eval else ()
        mirror_axes = tuple(a for a in mirror_axes if a < len(self.patch_size))
        results = {}
        tasks = tasks or list(self._datasets.keys())
        for t in tasks:
            ds, tr, val = self._datasets[t]
            head = use_head or (self.mh.tasks[-1] if always_use_last_head else t)
            if head not in self.mh.tasks:
                head = self.mh.tasks[-1]
            params = self.mh.assemble(head)
            apply_fn = lambda p, x: self.model.apply({"params": p}, x)
            if self.opts.val_mode == "patches" and not call_for_eval:
                results[t] = {"head": head,
                              "subjects": self._patch_validation(
                                  ds, val, params, t)}
                continue
            per_subject = {}
            for case in val:
                arr = np.asarray(ds.load(case))
                data = np.moveaxis(arr[:-1], 0, -1)
                seg = arr[-1].astype(np.int32)
                # bucket padding happens inside predict_sliding_window
                # (_prepare) and is undone before return
                probs = predict_sliding_window(
                    apply_fn, params, data, self.patch_size,
                    self.num_classes, mirror_axes=mirror_axes, window_batch=4)
                pred = np.argmax(probs, axis=-1)
                from ..evaluation.metrics import subject_metrics
                per_subject[case] = subject_metrics(pred, seg, self.num_classes)
            results[t] = {"head": head, "subjects": per_subject}
        out = {"epoch": self.epoch, "tag": tag, "results": results}
        self._val_history.append(out)
        path = os.path.join(self.output_folder,
                            "val_metrics_eval.json" if call_for_eval else "val_metrics.json")
        hist = self._val_history if not call_for_eval else [out]
        with open(path, "w") as f:
            json.dump(hist, f, indent=2)
        self._write_val_csv(path.replace(".json", ".csv"), hist)
        return results

    def _patch_validation(self, ds, val_cases, params, task: str) -> dict:
        """Reference-comparable patch-sampled validation (``multihead/
        nnUNetTrainerMultiHead.py:678-901``): draw ``val_iters`` batches of
        random foreground-oversampled patches from the task's val split
        (no augmentation, like the reference's ``get_no_augmentation``
        loaders), accumulate hard tp/fp/fn PER SUBJECT across draws (the
        reference's ``finish_online_evaluation_extended`` ``:963-1049``),
        and report per-subject Dice/IoU over the sampled patches."""
        import jax
        sampler = PatchSampler(ds, val_cases, self.patch_size,
                               self.batch_size,
                               oversample_foreground_percent=self.opts.oversample,
                               seed=self.opts.seed + 4242)

        @jax.jit
        def _counts(p, data, seg):
            outputs = self.model.apply({"params": p}, data)
            pred = jnp.argmax(outputs[0], axis=-1)
            valid = seg >= 0
            per = []
            ax = tuple(range(1, pred.ndim))
            for c in range(1, self.num_classes):
                hit = (pred == c) & valid
                lab = (seg == c) & valid
                per.append(jnp.stack([jnp.sum(hit & lab, axis=ax),
                                      jnp.sum(hit & ~lab, axis=ax),
                                      jnp.sum(~hit & lab, axis=ax)], -1))
            return jnp.stack(per, 1)          # [B, C-1, 3]

        acc: dict = {}
        for _ in range(self.opts.val_iters):
            b = sampler.next_batch()
            counts = np.asarray(_counts(params, jnp.asarray(b["data"]),
                                        jnp.asarray(b["seg"], jnp.int32)))
            for key, row in zip(b["keys"], counts):
                acc[key] = acc.get(key, 0) + row
        out = {}
        for case, row in acc.items():
            tp, fp, fn = row[:, 0], row[:, 1], row[:, 2]
            dice = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
            iou = tp / np.maximum(tp + fp + fn, 1)
            out[case] = {"dice": dice.tolist(), "iou": iou.tolist()}
        return out

    @staticmethod
    def _write_val_csv(path: str, history: list):
        import csv
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch", "tag", "task", "head", "subject", "metric", "class", "value"])
            for entry in history:
                for task, r in entry["results"].items():
                    for subj, metrics in r["subjects"].items():
                        for metric, vals in metrics.items():
                            for ci, v in enumerate(vals):
                                w.writerow([entry["epoch"], entry["tag"], task,
                                            r["head"], subj, metric, ci + 1, v])

    # -------------------------------------------------------------- checkpoints
    def save_checkpoint(self, name: str):
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-host: exactly ONE process writes (params are replicated
            # or fully addressable on host 0; concurrent writers would race
            # on the same files of a shared results folder)
            return
        from dataclasses import asdict
        manifest = {
            "plans": asdict(self.plans),
            "trainer": type(self).__name__,
            "extension": self.EXTENSION,
            "config_name": self.config_name,
            "plans_name": self.plans.plans_name,
            "task": self.plans.task,
            "patch_size": list(self.patch_size),
            "batch_size": self.batch_size,
            "base_num_features": int(self.model.base_num_features),
            "max_num_features": int(self.model.max_num_features),
            "use_vit": self.opts.use_vit,
            "vit": {
                "version": self.opts.vit_version, "type": self.opts.vit_type,
                "lsa": self.opts.vit_lsa, "spt": self.opts.vit_spt,
                "task_specific_ln": self.opts.vit_task_specific_ln,
                "ln_tasks": list(getattr(self.model, "ln_tasks", ())),
                "active_task_idx": int(getattr(self.model, "active_task_idx", 0)),
                "depth_override": self.opts.vit_depth_override,
            } if self.opts.use_vit else None,
            "fold": self.opts.fold,
            "split_at": self.opts.split_at,
            "transfer_heads": self.TRANSFER_HEADS,
            "hyperparams": {k: str(v) for k, v in self.hyperparams.items()},
        }
        manifest.update(self.extra_manifest())
        checkpoints.save_checkpoint(
            os.path.join(self.output_folder, name), self.mh,
            opt_state=self.state.opt_state if self.state else None,
            cl_state=self.cl_state, step=self.global_step, epoch=self.epoch,
            manifest=manifest,
            # transfer-heads trainers never read state_init (new heads copy
            # the active head) — skip the duplicate initial-head blob
            include_state_init=not self.TRANSFER_HEADS)

    def load_checkpoint(self, name: str = "model_final_checkpoint",
                        restore_opt: bool = True):
        base = os.path.join(self.output_folder, name)
        mh, blob, manifest = checkpoints.load_checkpoint(base)
        self.mh = mh
        self.epoch = manifest["epoch"]
        self.global_step = manifest["step"]
        # let multi-phase trainers (LwF) adopt phase flags from the manifest
        # BEFORE the step/optimizer are rebuilt, so the restored opt_state
        # structure matches the rebuilt one
        self._adopt_manifest(manifest)
        self._build_step()
        self.state = TrainState.create(self._wrap_params(self.mh.assemble()), self.tx)
        if restore_opt and manifest.get("has_opt_state"):
            try:
                opt_state = checkpoints.restore_into(self.state.opt_state,
                                                     blob["opt_state"])
                self.state = self.state.replace(
                    opt_state=opt_state,
                    step=jnp.asarray(self.global_step, jnp.int32))
            except (ValueError, KeyError, TypeError):
                self.logger("checkpoint opt_state structure mismatch — "
                            "resuming with a fresh optimizer")
        if manifest.get("has_cl_state") and blob.get("cl_state") is not None:
            template = self.cl_state
            try:
                self.cl_state = checkpoints.restore_into(template, blob["cl_state"])
            except Exception:
                self.cl_state = blob["cl_state"]
        if restore_opt:
            # keep the restored optimizer state across the _build_step a
            # subsequent train_task(..., start_epoch=N) performs
            self._resume_state = self.state
        return manifest
