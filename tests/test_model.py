"""M1 tests: U-Net shapes, multi-head partitioning, train-step learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_nnunet_tpu.models.unet import GenericUNet, ds_scale_factors
from lifelong_nnunet_tpu.models.multihead import (MultiHeadParams, flatten,
                                                  name_filter_mask, split_params,
                                                  unflatten)
from lifelong_nnunet_tpu.ops.losses import (deep_supervision_loss, ds_weights,
                                            dc_and_ce_loss, soft_dice_loss)
from lifelong_nnunet_tpu.training.optimizer import make_optimizer, poly_lr_schedule
from lifelong_nnunet_tpu.training.train_step import (StepConfig, TrainState,
                                                     make_train_step)


def tiny_unet(num_pool=2, dim=3, num_classes=3, feats=8):
    return GenericUNet(
        num_classes=num_classes,
        pool_op_kernel_sizes=tuple(tuple([2] * dim) for _ in range(num_pool)),
        conv_kernel_sizes=tuple(tuple([3] * dim) for _ in range(num_pool + 1)),
        base_num_features=feats, max_num_features=32,
    )


def test_unet_shapes_3d():
    model = tiny_unet()
    x = jnp.zeros((2, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert len(outs) == 2  # num_pool DS outputs
    assert outs[0].shape == (2, 16, 16, 16, 3)   # full res first
    assert outs[1].shape == (2, 8, 8, 8, 3)
    assert outs[0].dtype == jnp.float32


def test_unet_shapes_2d_anisotropic_pools():
    model = GenericUNet(
        num_classes=2,
        pool_op_kernel_sizes=((2, 2), (2, 1)),
        conv_kernel_sizes=((3, 3), (3, 3), (3, 1)),
        base_num_features=4, max_num_features=16)
    x = jnp.zeros((1, 16, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert outs[0].shape == (1, 16, 8, 2)
    assert outs[1].shape == (1, 8, 4, 2)


def test_unet_taps():
    model = tiny_unet()
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs, taps = model.apply({"params": params}, x, capture_taps=True)
    assert set(taps) == {"enc0", "enc1", "bottleneck", "dec0", "dec1"}


def test_ds_scale_factors():
    f = ds_scale_factors(((2, 2, 2), (2, 2, 1), (2, 2, 2)))
    assert f == [(1, 1, 1), (2, 2, 2), (4, 4, 2)]


def test_ds_weights():
    # reference mask (multihead/nnUNetTrainerMultiHead.py:1380) zeroes ONLY
    # the coarsest output; intermediate resolutions keep their 1/2^i weight
    w = ds_weights(4)
    assert w[3] == 0 and w[2] > 0
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert w[0] == 2 * w[1] and w[1] == 2 * w[2]
    w3 = ds_weights(3)
    assert w3[2] == 0 and w3[1] > 0  # 3-output nets keep deep supervision
    w2 = ds_weights(2)
    assert w2[1] == 0 and w2[0] == 1.0


def test_multihead_split_assemble():
    model = tiny_unet()
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mh = MultiHeadParams.create(params, "seg_outputs", model.module_order(), "TaskA")
    # heads contain exactly the seg convs
    assert all(p.startswith("seg") for p in mh.heads["TaskA"])
    assert not any(p.startswith("seg") for p in mh.body)
    # assemble reproduces the original tree exactly
    re = mh.assemble("TaskA")
    for k, v in flatten(params).items():
        np.testing.assert_array_equal(v, flatten(re)[k])


def test_multihead_split_mid_network():
    model = tiny_unet()
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    body, head = split_params(params, "dec1", model.module_order())
    # everything from dec1 on (dec1, seg0, seg1) is head; up1 is body
    tops_head = {p.split("/")[0] for p in head}
    assert tops_head == {"dec1", "seg0", "seg1"}
    assert "up1" in {p.split("/")[0] for p in body}


def test_multihead_add_task_semantics():
    model = tiny_unet()
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mh = MultiHeadParams.create(params, "seg_outputs", model.module_order(), "A")
    # mutate A's head (simulating training)
    trained = {k: v + 1.0 for k, v in mh.heads["A"].items()}
    mh = mh.absorb(unflatten({**mh.body, **trained}), "A")
    # Multi-Head: new task from init -> differs from trained A
    mh_init = mh.add_new_task("B", use_init=True)
    k0 = next(iter(mh.heads["A"]))
    assert not np.allclose(mh_init.heads["B"][k0], mh.heads["A"][k0])
    np.testing.assert_array_equal(mh_init.heads["B"][k0], mh.state_init[k0])
    # Sequential/transfer: new task copies trained active head
    mh_tr = mh.add_new_task("C", use_init=False)
    np.testing.assert_array_equal(mh_tr.heads["C"][k0], mh.heads["A"][k0])
    assert mh_tr.active_task == "C"
    # restore path
    mh_rest = mh.add_n_tasks_and_activate(["B", "C"], "B")
    assert mh_rest.tasks == ["A", "B", "C"] and mh_rest.active_task == "B"


def test_trainable_mask_freeze_body():
    model = tiny_unet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))["params"]
    mh = MultiHeadParams.create(params, "seg_outputs", model.module_order(), "A")
    mask = flatten(mh.trainable_mask(freeze_body=True))
    assert all(v == k.startswith("seg") for k, v in mask.items())


def test_name_filter_mask():
    params = {"ViT": {"norm1": {"scale": np.ones(2)}, "attn": {"w": np.ones(2)}},
              "enc0": {"w": np.ones(2)}}
    m = flatten(name_filter_mask(params, ["vit", "norm"], include=True))
    assert m["ViT/norm1/scale"] and not m["ViT/attn/w"] and not m["enc0/w"]
    m2 = flatten(name_filter_mask(params, ["vit"], include=False))
    assert not m2["ViT/attn/w"] and m2["enc0/w"]


def test_poly_lr():
    sch = poly_lr_schedule(0.01, 10, 5)
    assert sch(0) == 0.01
    assert abs(sch(5) - 0.01 * (0.9 ** 0.9)) < 1e-9
    assert sch(49) < sch(5)


def test_loss_sane():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32))
    target = jnp.asarray(rng.randint(-1, 3, size=(2, 8, 8, 8)))
    l = dc_and_ce_loss(logits, target)
    assert np.isfinite(float(l)) and float(l) > 0
    # perfect prediction -> dice loss ~ 0
    perfect = jax.nn.one_hot(jnp.clip(target, 0, 2), 3) * 50.0
    assert float(soft_dice_loss(perfect, target)) < 0.01


def test_train_step_learns():
    """~80 steps on a fixed blob batch should push fg dice well up."""
    model = tiny_unet(num_pool=2, feats=8)
    rng = np.random.RandomState(0)
    seg = np.zeros((2, 16, 16, 16), dtype=np.int32)
    seg[:, 4:12, 4:12, 4:12] = 1
    seg[:, 6:10, 6:10, 6:10] = 2
    data = (seg[..., None] * 0.8 + rng.normal(0, 0.1, seg.shape + (1,))).astype(np.float32)
    batch = {"data": jnp.asarray(data), "seg": jnp.asarray(seg)}

    params = model.init(jax.random.PRNGKey(0), batch["data"])["params"]
    tx = make_optimizer(max_epochs=10, iters_per_epoch=10)
    state = TrainState.create(params, tx)
    cfg = StepConfig(ds_factors=((1, 1, 1), (2, 2, 2)), batch_dice=True,
                     num_classes=3, augment=None)
    step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(80):
        state, _, m = step(state, None, batch, key)
        losses.append(float(m["loss"]))
    tp, fp, fn = np.asarray(m["tp"]), np.asarray(m["fp"]), np.asarray(m["fn"])
    dice = (2 * tp / np.maximum(2 * tp + fp + fn, 1)).mean()
    assert losses[-1] < losses[0] - 0.3, (losses[0], losses[-1])
    assert dice > 0.5, dice


def test_remat_equivalence():
    """jax.checkpoint'd conv stages compute identical losses/grads."""
    import optax
    seg = np.zeros((1, 16, 16, 16), dtype=np.int32)
    seg[:, 4:12, 4:12, 4:12] = 1
    data = jnp.asarray((seg[..., None] * 0.5).astype(np.float32))
    seg = jnp.asarray(seg)
    losses = {}
    for remat in (False, True):
        model = tiny_unet(num_pool=2, feats=4)
        model = model.clone(remat=remat)
        params = model.init(jax.random.PRNGKey(0), data)["params"]
        def loss_fn(p):
            outs = model.apply({"params": p}, data)
            return deep_supervision_loss(outs, seg, ((1, 1, 1), (2, 2, 2)))
        l, g = jax.value_and_grad(loss_fn)(params)
        losses[remat] = (float(l), g)
    assert losses[False][0] == losses[True][0]
    ga = jax.tree.leaves(losses[False][1])
    gb = jax.tree.leaves(losses[True][1])
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_int8_conv_path_checkpoint_compatible_and_close():
    """The mixed-precision int8 inference path (LNN_INT8_CONV / int8_min_ch,
    VERDICT r2 #4): identical param tree to the bf16/f32 model (checkpoints
    are flag-agnostic) and predictions that agree with the full-precision
    forward — the quant scales and conv bias cancel exactly through
    InstanceNorm, so only 8-bit rounding error remains."""
    model = tiny_unet()
    model8 = model.clone(int8_min_ch=16)  # quantize stages with C >= 16
    x = jnp.asarray(np.random.RandomState(0).normal(size=(1, 16, 16, 16, 1)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    params8 = model8.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params8))
    out = model.apply({"params": params}, x)[0]
    out8 = model8.apply({"params": params}, x)[0]
    rel = float(jnp.max(jnp.abs(out - out8)) / jnp.max(jnp.abs(out)))
    agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(out8, -1)))
    assert rel < 0.1, rel
    assert agree > 0.97, agree
