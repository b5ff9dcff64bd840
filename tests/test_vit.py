"""M7 tests: VisionTransformer components + Generic_ViT_UNet V1-V4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lifelong_nnunet_tpu.models.vit import (Attention, VisionTransformer,
                                            patch_dim_for, vit_kwargs_for_type)
from lifelong_nnunet_tpu.models.vit_unet import GenericViTUNet


def tiny_vit_unet(version="V1", **kw):
    return GenericViTUNet(
        num_classes=3,
        pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((3, 3, 3),) * 3,
        base_num_features=4, max_num_features=16,
        vit_version=version, vit_embed_dim=32, vit_depth=2, vit_heads=2, **kw)


def test_patch_dim_rule():
    assert patch_dim_for((32, 48)) == (16, 16)   # gcd divisors <= 16
    assert patch_dim_for((40, 56, 40)) == (8, 8, 8)
    assert patch_dim_for((7, 5)) == (1, 1)
    assert patch_dim_for((16, 16)) == (16, 16)


def test_vit_sizes():
    assert vit_kwargs_for_type("base") == {"embed_dim": 768, "depth": 12,
                                           "num_heads": 12}
    assert vit_kwargs_for_type("huge")["depth"] == 32
    with pytest.raises(KeyError):
        vit_kwargs_for_type("giant")


def test_vit_dense_output_3d():
    vit = VisionTransformer(out_features=(8,), embed_dim=32, depth=2, num_heads=2)
    x = jnp.zeros((2, 8, 8, 8, 4))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    out = vit.apply({"params": params}, x)
    assert out.shape == (2, 1, 1, 1, 8)  # 8^3 patches of size 8 -> 1 token/axis
    out2, attns = vit.apply({"params": params}, x, return_attn=True)
    assert len(attns) == 2 and attns[0].shape[1] == 2  # depth layers, heads


def test_lsa_attention_diagonal_masked():
    attn = Attention(num_heads=2, lsa=True)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(1, 6, 8)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)["params"]
    _, w = attn.apply({"params": params}, x)
    diag = np.asarray(jnp.diagonal(w[0, 0]))
    assert np.all(diag < 1e-6)  # self-attention masked out
    assert "temperature" in params


def test_spt_changes_param_structure():
    v_spt = VisionTransformer(out_features=(4,), embed_dim=16, depth=1,
                              num_heads=2, spt=True)
    x = jnp.zeros((1, 8, 8, 2))
    params = v_spt.init(jax.random.PRNGKey(0), x)["params"]
    # SPT embedding sees 5x input channels (original + 4 shifted copies)
    kernel = params["patch_embed_0"]["embed"]["proj"]["kernel"]
    assert kernel.shape[-2] == 10  # 2 channels * 5


@pytest.mark.parametrize("version", ["V1", "V2", "V3", "V4"])
def test_vit_unet_versions(version):
    model = tiny_vit_unet(version)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert outs[0].shape == (1, 16, 16, 16, 3)
    assert outs[1].shape == (1, 8, 8, 8, 3)
    assert "vit" in params
    # module order places vit correctly for splitting
    order = model.module_order()
    if version == "V4":
        assert order.index("vit") > order.index("dec1")
    else:
        assert order.index("vit") < order.index("up0")


def test_vit_unet_task_specific_lns():
    model = tiny_vit_unet("V1", ln_tasks=("A", "B"), active_task_idx=0)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    flat_keys = [k for k in _flat(params) if "ln_A" in k]
    assert flat_keys, "per-task LN params missing"
    assert any("ln_B" in k for k in _flat(params))
    # switching the active task uses different LN params -> same output when
    # LNs are at init (identical), different after perturbing task B's LNs
    out_a = model.apply({"params": params}, x)[0]
    model_b = model.clone(active_task_idx=1)
    out_b = model_b.apply({"params": params}, x)[0]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    from flax import traverse_util
    fp = traverse_util.flatten_dict(params)
    fp2 = {k: (v + 1.0 if "ln_B" in "/".join(k) and "scale" in "/".join(k) else v)
           for k, v in fp.items()}
    params2 = traverse_util.unflatten_dict(fp2)
    out_b2 = model_b.apply({"params": params2}, x)[0]
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b2), atol=1e-3)


def test_vit_unet_multihead_split():
    from lifelong_nnunet_tpu.models.multihead import MultiHeadParams
    model = tiny_vit_unet("V1")
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mh = MultiHeadParams.create(params, "seg_outputs", model.module_order(), "A")
    assert any(k.startswith("vit/") for k in mh.body)  # vit is body
    assert all(k.startswith("seg") for k in mh.heads["A"])
    re = mh.assemble("A")
    outs = model.apply({"params": re}, x)
    assert outs[0].shape == (1, 16, 16, 16, 3)


def _flat(params):
    from lifelong_nnunet_tpu.models.multihead import flatten
    return flatten(params)


def test_flash_attention_gating():
    """Flash routing (RESULTS.md round-3 probe): TPU+bf16+>=512 tokens only;
    CPU/fp32/short sequences stay on the XLA einsum path, and the two call
    modes (need_weights True/False) share the identical parameter tree."""
    from lifelong_nnunet_tpu.models.vit import _flash_eligible
    # this suite runs on CPU -> never eligible regardless of shape/dtype
    assert not _flash_eligible(512, jnp.bfloat16)
    attn = Attention(num_heads=2, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 512, 16)),
                    jnp.float32)
    p1 = attn.init(jax.random.PRNGKey(0), x, True)["params"]
    p2 = attn.init(jax.random.PRNGKey(0), x, False)["params"]
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    out_w, w = attn.apply({"params": p1}, x, True)
    out_nw, nw = attn.apply({"params": p1}, x, False)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_nw))
    assert w is not None
