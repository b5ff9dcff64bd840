"""Fused Pallas conv3d+InstanceNorm+LeakyReLU — correctness on CPU
(interpret mode) against the XLA composition, plus the checkpoint-tree
invariance of the model flag.  TPU performance numbers live in RESULTS.md
(round 2): 21.2 ms vs XLA 27.9 ms at 128^3/C32, full CT forward 157 ms vs
212.7 ms (1.35x)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lifelong_nnunet_tpu.ops.pallas.conv3d as c3


@pytest.fixture()
def interpret_pallas(monkeypatch):
    real = c3.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return real(*a, **k)

    monkeypatch.setattr(c3.pl, "pallas_call", patched)
    c3.conv3d_direct_cf._clear_cache()
    yield
    c3.conv3d_direct_cf._clear_cache()


def _xla_ref(x, w, scale, off, slope=0.01):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    mean = y.mean(axis=(1, 2, 3), keepdims=True)
    var = y.var(axis=(1, 2, 3), keepdims=True)
    z = (y - mean) * jax.lax.rsqrt(var + 1e-5) * scale + off
    return jnp.where(z >= 0, z, slope * z)


def test_supported_gating():
    assert c3.supported((2, 8, 8, 128, 32), (3, 3, 3), (1, 1, 1))
    assert not c3.supported((2, 8, 8, 128, 32), (3, 3, 3), (2, 2, 2))  # stride
    assert not c3.supported((2, 8, 8, 128, 32), (1, 1, 1), (1, 1, 1))  # kernel
    assert not c3.supported((2, 8, 8, 100, 32), (3, 3, 3), (1, 1, 1))  # W%128
    assert not c3.supported((2, 8, 8, 128, 96), (3, 3, 3), (1, 1, 1))  # C>64


def test_conv3d_direct_matches_xla(interpret_pallas):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 8, 128, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8) * 0.1, jnp.float32)
    y, partials = c3.conv3d_direct(x, w, out_dtype=jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)
    # partials reduce to the exact per-(batch,channel) sums
    # f32 summation-order differences: loose atol for near-zero sums
    s = np.asarray(partials[:, :, :, 0, :]).sum((1, 2))
    np.testing.assert_allclose(s, np.asarray(ref).sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-2)


def test_fused_matches_xla_composition(interpret_pallas):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 8, 128, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 16) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    fused = c3.conv3d_in_lrelu(x, w, scale, off, out_dtype=jnp.float32)
    ref = _xla_ref(x, w, scale, off)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_model_flag_keeps_param_tree():
    """pallas_conv must not change the checkpoint tree (flag-agnostic
    restore); on CPU the flag is inert (kernel requires TPU) but the holder
    modules must still produce nn.Conv/InstanceNorm-shaped params when the
    eligibility check is forced."""
    from lifelong_nnunet_tpu.models.unet import GenericUNet
    m0 = GenericUNet(num_classes=3, pool_op_kernel_sizes=((2, 2, 2),),
                     conv_kernel_sizes=((3, 3, 3), (3, 3, 3)),
                     base_num_features=4, max_num_features=8)
    m1 = m0.clone(pallas_conv=True)
    x = jnp.zeros((1, 8, 8, 8, 1))
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        assert a.shape == b.shape


def test_maybe_pallas_conv_env(monkeypatch):
    from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv
    m = GenericUNet(num_classes=2, pool_op_kernel_sizes=((2, 2, 2),),
                    conv_kernel_sizes=((3, 3, 3), (3, 3, 3)))
    monkeypatch.delenv("LNN_PALLAS_CONV", raising=False)
    assert maybe_pallas_conv(m).pallas_conv is True  # default ON (TPU-gated)
    monkeypatch.setenv("LNN_PALLAS_CONV", "0")
    assert maybe_pallas_conv(m).pallas_conv is False
    monkeypatch.setenv("LNN_PALLAS_CONV", "1")
    assert maybe_pallas_conv(m).pallas_conv is True


def test_pack_plan_covers_nnunet_widths():
    # hippocampus stage 0: W=40 packs 3 windows/128 lanes
    plan = c3.pack_plan((9, 40, 56, 40, 32))
    assert plan is not None
    k, period, L, Hp, Bp = plan
    assert period == 42 and L % 128 == 0 and Bp % k == 0 and Bp >= 9
    # hippocampus stage 1: W=20, H=28 needs the 8-row pad
    assert c3.pack_plan((9, 20, 28, 20, 64)) is not None
    # CT stage 1: W=64
    assert c3.pack_plan((2, 64, 64, 64, 64)) is not None
    # lane-aligned widths stay on the direct path
    assert c3.pack_plan((2, 8, 8, 128, 32)) is None
    assert c3.eligible((9, 40, 56, 40, 32), (3, 3, 3), (1, 1, 1))
    assert not c3.eligible((9, 40, 56, 40, 96), (3, 3, 3), (1, 1, 1))


def test_packed_fused_matches_xla_composition(interpret_pallas):
    """W=40 (not a lane multiple) + H=6 (not a sublane multiple) + B=5 (needs
    batch pad): the packed path must still be exact on every window."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(5, 4, 6, 40, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 16) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    assert c3.pack_plan((5, 4, 6, 40, 16)) is not None
    fused = c3.conv3d_in_lrelu(x, w, scale, off, out_dtype=jnp.float32)
    ref = _xla_ref(x, w, scale, off)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_packed_vjp_matches_xla_grads(interpret_pallas):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 4, 6, 40, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.randn(4, 4, 6, 40, 8), jnp.float32)

    def loss_pallas(x, w, s, o):
        return jnp.mean((c3.conv3d_in_lrelu(x, w, s, o,
                                            out_dtype=jnp.float32) - tgt) ** 2)

    def loss_xla(x, w, s, o):
        return jnp.mean((_xla_ref(x, w, s, o) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, scale, off)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, scale, off)
    for a, b, name in zip(gp, gx, ("dx", "dw", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_fused_vjp_matches_xla_grads(interpret_pallas):
    """The custom VJP (LeakyReLU mask -> IN backward -> dx via the flipped
    kernel, dw via XLA) must match autodiff through the XLA composition."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 8, 128, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.randn(1, 4, 8, 128, 8), jnp.float32)

    def loss_pallas(x, w, s, o):
        return jnp.mean((c3.conv3d_in_lrelu(x, w, s, o,
                                            out_dtype=jnp.float32) - tgt) ** 2)

    def loss_xla(x, w, s, o):
        return jnp.mean((_xla_ref(x, w, s, o) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, scale, off)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, scale, off)
    for a, b, name in zip(gp, gx, ("dx", "dw", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)
