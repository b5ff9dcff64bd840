"""2.5D conv decomposition == direct lax conv3d (ops/conv25d).

The route exists for CT-scale performance (RESULTS.md round 4); these
tests pin its numerics to the direct conv at every kernel/stride shape
the nnU-Net plans emit (reference generic_UNet.py conv_kernel_sizes /
pool_op_kernel_sizes combinations).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from lifelong_nnunet_tpu.ops.conv25d import (conv3d_slicewise,
                                             conv25d_in_lrelu, eligible)


def _direct(x, w, stride):
    pads = [(k // 2, k // 2) for k in w.shape[:3]]
    return lax.conv_general_dilated(
        x, w, tuple(stride), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


CASES = [
    # (shape NDHWC, kernel, stride)
    ((2, 12, 10, 8, 5), (3, 3, 3), (1, 1, 1)),
    ((2, 12, 10, 8, 5), (3, 3, 3), (2, 2, 2)),
    ((1, 13, 9, 11, 4), (3, 3, 3), (1, 2, 2)),   # anisotropic plan stride
    ((2, 12, 10, 8, 5), (1, 3, 3), (1, 1, 1)),   # anisotropic kernel
    ((2, 12, 10, 8, 5), (1, 3, 3), (1, 2, 2)),
    ((2, 12, 10, 8, 1), (3, 3, 3), (1, 1, 1)),   # Cin=1 first conv
    # phase-merged strided branches (_conv2d_phase_strided): sh/sw combos
    ((2, 12, 10, 8, 5), (3, 3, 3), (2, 2, 1)),   # sh=2, sw=1 branch
    ((2, 12, 10, 8, 5), (3, 3, 3), (1, 1, 2)),   # sh=1, sw=2 branch
    ((2, 12, 10, 8, 5), (3, 3, 3), (2, 1, 2)),   # D+W stride only
    ((2, 12, 9, 8, 5), (3, 3, 3), (2, 2, 2)),    # odd H -> fallback path
]


@pytest.mark.parametrize("shape,kernel,stride", CASES)
def test_matches_direct_conv_f32(shape, kernel, stride):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=kernel + (shape[-1], 6)), jnp.float32)
    ref = _direct(x, w, stride)
    got = conv3d_slicewise(x, w, stride)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_direct_conv_bf16():
    """bf16 path: partial-sum rounding only — stays within a few bf16 ulps."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 8, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(scale=0.1, size=(3, 3, 3, 8, 8)), jnp.bfloat16)
    ref = np.asarray(_direct(x, w, (1, 1, 1)).astype(jnp.float32))
    got = np.asarray(conv3d_slicewise(x, w, (1, 1, 1)).astype(jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.03 * scale


def test_fused_block_matches_composition():
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.normal(size=(2, 10, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    offset = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    y = _direct(x, w, (1, 1, 1)).astype(jnp.float32)
    mean = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(y, axis=(1, 2, 3), keepdims=True)
    ref = (y - mean) * lax.rsqrt(var + 1e-5) * scale + offset
    ref = jnp.where(ref >= 0, ref, ref * 0.01)
    got = conv25d_in_lrelu(x, w, scale, offset, 0.01,
                           out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_direct():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 6, 6, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)), jnp.float32)

    def loss_25d(x, w):
        return jnp.sum(jnp.square(conv3d_slicewise(x, w, (2, 2, 2))))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(_direct(x, w, (2, 2, 2))))

    gx1, gw1 = jax.grad(loss_25d, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_eligibility_gate():
    # CT stage 0: eligible
    assert eligible((2, 128, 128, 128, 32), (3, 3, 3), (1, 1, 1), 32, 32)
    assert eligible((4, 128, 128, 128, 1), (3, 3, 3), (1, 1, 1), 1, 32)
    # round 5: decoder skip-concat convs (wide cin, cout<=64) now eligible
    assert eligible((4, 128, 128, 128, 96), (3, 3, 3), (1, 1, 1), 96, 32)
    assert eligible((4, 64, 64, 64, 192), (3, 3, 3), (1, 1, 1), 192, 64)
    # round 5: hippocampus-scale C<=32 stages now eligible (measured win)
    # at TRAINING batch sizes; serving-scale 2D batches stay on XLA
    assert eligible((9, 56, 40, 40, 32), (3, 3, 3), (1, 1, 1), 32, 32)
    assert not eligible((64, 56, 40, 40, 32), (3, 3, 3), (1, 1, 1), 32, 32)
    # ... but not C64 (loses at small batch) or the Cin=1 input conv
    assert not eligible((9, 28, 20, 20, 64), (3, 3, 3), (1, 1, 1), 64, 64)
    assert not eligible((9, 56, 40, 40, 1), (3, 3, 3), (1, 1, 1), 1, 32)
    # wide deep stages stay on existing paths (cout > 64)
    assert not eligible((2, 128, 128, 128, 128), (3, 3, 3), (1, 1, 1),
                        128, 128)
    # unsupported kernels/strides (every strided formulation measured
    # pathological at C32 — r5 probes; direct XLA is least-bad)
    assert not eligible((2, 128, 128, 128, 32), (1, 1, 1), (1, 1, 1), 32, 32)
    assert not eligible((2, 128, 128, 128, 32), (3, 3, 3), (2, 2, 2), 32, 32)


def test_convnormact_route_matches_xla(monkeypatch):
    """ConvNormAct with conv25d=True (gate forced open) == the XLA
    composition with identical params — flag-agnostic checkpoints."""
    import lifelong_nnunet_tpu.models.unet as unet_mod
    from lifelong_nnunet_tpu.models.unet import ConvNormAct

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 8, 8, 4)), jnp.float32)

    m_ref = ConvNormAct(features=6, kernel=(3, 3, 3), stride=(1, 1, 1))
    params = m_ref.init(jax.random.PRNGKey(0), x)
    ref = m_ref.apply(params, x)

    m_25d = ConvNormAct(features=6, kernel=(3, 3, 3), stride=(1, 1, 1),
                        conv25d=True)
    # force the shape gate open for the small CPU-testable volume
    monkeypatch.setattr("lifelong_nnunet_tpu.ops.conv25d.eligible",
                        lambda *a: True)
    got = m_25d.apply(params, x)
    # conv bias is absorbed by IN on the fused route: exact equality of the
    # normalized output up to float tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_conv_transpose_slicewise_matches_lax():
    rng = np.random.RandomState(4)
    from lifelong_nnunet_tpu.ops.conv25d import conv_transpose3d_slicewise
    for stride in ((2, 2, 2), (1, 2, 2), (2, 2, 1)):
        x = jnp.asarray(rng.normal(size=(2, 6, 5, 4, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(size=stride + (3, 7)), jnp.float32)
        ref = lax.conv_transpose(x, w, stride, "VALID",
                                 dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = conv_transpose3d_slicewise(x, w, stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_conv_transpose_matmul_matches_lax():
    """Octant-pair matmul upsample (conv_transpose3d_matmul) is exact vs
    lax.conv_transpose for k=s=2 (taps never overlap)."""
    rng = np.random.RandomState(5)
    from lifelong_nnunet_tpu.ops.conv25d import conv_transpose3d_matmul
    x = jnp.asarray(rng.normal(size=(2, 6, 5, 4, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 7)), jnp.float32)
    ref = lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                             dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv_transpose3d_matmul(x, w, (2, 2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # gradient flows through the stack/reshape adjoints
    g = jax.grad(lambda xx: jnp.sum(
        jnp.square(conv_transpose3d_matmul(xx, w, (2, 2, 2)))))(x)
    gr = jax.grad(lambda xx: jnp.sum(jnp.square(lax.conv_transpose(
        xx, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_strided_phase_gradients_match_direct():
    """Backward pass through the phase-merged strided conv == direct."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)), jnp.float32)

    def loss(fn):
        return lambda xx, ww: jnp.sum(jnp.square(fn(xx, ww)))

    for stride in ((2, 2, 2), (1, 2, 2), (2, 2, 1)):
        gx, gw = jax.grad(loss(lambda a, b, s=stride: conv3d_slicewise(
            a, b, s)), argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss(lambda a, b, s=stride: _direct(
            a, b, s)), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-4)


def test_vit_unet_consumes_routing_flags(monkeypatch):
    """VERDICT r4 weak #4: GenericViTUNet dropped pallas_conv/conv25d on
    the floor.  With the gates forced open, the 2.5D routes must (a) FIRE
    (probe counters) and (b) produce the same outputs as the plain model
    under identical params."""
    import lifelong_nnunet_tpu.ops.conv25d as c25
    from lifelong_nnunet_tpu.models.vit_unet import GenericViTUNet

    kw = dict(num_classes=3, pool_op_kernel_sizes=((2, 2, 2),) * 2,
              conv_kernel_sizes=((3, 3, 3),) * 3, base_num_features=4,
              max_num_features=16, vit_version="V1", vit_type="base",
              vit_embed_dim=16, vit_depth=1, vit_heads=2)
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(1, 16, 16, 16, 1)), jnp.float32)
    m_ref = GenericViTUNet(**kw)
    params = m_ref.init(jax.random.PRNGKey(0), x)
    ref = m_ref.apply(params, x)

    calls = {"conv": 0, "upt": 0}
    real_conv, real_upt = c25.conv3d_slicewise, c25.conv_transpose3d_matmul

    def spy_conv(*a, **k):
        calls["conv"] += 1
        return real_conv(*a, **k)

    def spy_upt(*a, **k):
        calls["upt"] += 1
        return real_upt(*a, **k)

    monkeypatch.setattr(c25, "eligible", lambda *a: True)
    monkeypatch.setattr(c25, "upsample_eligible", lambda *a: True)
    monkeypatch.setenv("LNN_UPT_MODE", "matmul")  # default "direct" (r5)
    monkeypatch.setattr(c25, "conv3d_slicewise", spy_conv)
    monkeypatch.setattr(c25, "conv_transpose3d_matmul", spy_upt)

    m_25d = GenericViTUNet(**kw, conv25d=True)
    got = m_25d.apply(params, x)
    assert calls["conv"] > 0, "conv25d route did not fire in ViT-UNet"
    assert calls["upt"] > 0, "2.5D upsample route did not fire in ViT-UNet"
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_unet_upsample_route_matches(monkeypatch):
    """GenericUNet with the 2.5D upsample route (gate forced) == the
    nn.ConvTranspose decoder with identical params."""
    from lifelong_nnunet_tpu.models.unet import GenericUNet

    kw = dict(num_classes=3, pool_op_kernel_sizes=((2, 2, 2),) * 2,
              conv_kernel_sizes=((3, 3, 3),) * 3, base_num_features=4,
              max_num_features=16)
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(1, 16, 16, 16, 1)), jnp.float32)
    m_ref = GenericUNet(**kw)
    params = m_ref.init(jax.random.PRNGKey(0), x)
    ref = m_ref.apply(params, x)

    # conv25d=True but keep the conv route shut so ONLY the upsample
    # route differs (the conv gate needs >=256k voxels — never fires here);
    # force the upsample gate open.
    monkeypatch.setattr("lifelong_nnunet_tpu.ops.conv25d.upsample_eligible",
                        lambda *a: True)
    monkeypatch.setenv("LNN_UPT_MODE", "matmul")  # default is "direct" (r5)
    m_25d = GenericUNet(**kw, conv25d=True)
    got = m_25d.apply(params, x)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_concat_free_skip_fusion_matches(monkeypatch):
    """ConvStage(h, skip) with the pair route forced == ConvStage on the
    explicit concat with identical params (convolution is linear in
    channels)."""
    import lifelong_nnunet_tpu.ops.conv25d as c25
    from lifelong_nnunet_tpu.models.unet import ConvStage

    rng = np.random.RandomState(6)
    h = jnp.asarray(rng.normal(size=(2, 10, 8, 8, 4)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(2, 10, 8, 8, 6)), jnp.float32)

    m = ConvStage(features=5, kernel=(3, 3, 3), first_stride=(1, 1, 1))
    cat = jnp.concatenate([h, skip], axis=-1)
    params = m.init(jax.random.PRNGKey(0), cat)
    ref = m.apply(params, cat)

    monkeypatch.setattr(c25, "eligible", lambda *a: True)
    monkeypatch.setenv("LNN_PAIR_FUSION", "1")  # opt-in (regressed on chip)
    m_pair = ConvStage(features=5, kernel=(3, 3, 3), first_stride=(1, 1, 1),
                       conv25d=True)
    got = m_pair.apply(params, h, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)

    # ineligible fall-back: local concat, same result, same param tree
    m_fb = ConvStage(features=5, kernel=(3, 3, 3), first_stride=(1, 1, 1))
    got_fb = m_fb.apply(params, h, skip)
    np.testing.assert_allclose(np.asarray(got_fb), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_phase_strided_conv_matches_direct():
    """conv3d_phase_strided (Pallas phase split, interpret mode) == the
    direct stride-2 conv, forward and gradients."""
    from lifelong_nnunet_tpu.ops.conv25d import conv3d_phase_strided
    rng = np.random.RandomState(12)
    for shape, co in (((2, 8, 6, 4, 3), 5), ((1, 4, 4, 8, 2), 4)):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], co)),
                        jnp.float32)
        ref = _direct(x, w, (2, 2, 2))
        got = conv3d_phase_strided(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        gx, gw = jax.grad(lambda a, b: jnp.sum(jnp.square(
            conv3d_phase_strided(a, b, interpret=True))),
            argnums=(0, 1))(x, w)
        rx, rw = jax.grad(lambda a, b: jnp.sum(jnp.square(
            _direct(a, b, (2, 2, 2)))), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-4)
