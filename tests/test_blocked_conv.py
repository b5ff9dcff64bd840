"""ops/blocked_conv: blocked SAME/sym-padded conv + 2-conv stage parity.

The blocked layout must be numerically identical to the direct composition
(it IS the same math — VALID conv over halo'd partitions); these tests pin
that for every routing the models use: stride 1, per-axis stride 2, uneven
block sizes, gradients, and the ConvStage integration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lifelong_nnunet_tpu.ops.blocked_conv import (
    block_with_halo, blocked_conv_same, blocked_stage, pick_blocks, rehalo,
    stride_ok, unblock)


def _conv(x, w, st=(1, 1, 1)):
    return lax.conv_general_dilated(
        x, w, st, [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _block(x, w, sc, of, st=(1, 1, 1)):
    y = _conv(x, w, st)
    m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    v = jnp.maximum(
        jnp.mean(jnp.square(y), axis=(1, 2, 3), keepdims=True) - m * m, 0.0)
    z = (y - m) * lax.rsqrt(v + 1e-5) * sc + of
    return jnp.where(z >= 0, z, 0.01 * z)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 64, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 7)) * 0.2, jnp.float32)
    return rng, x, w


def test_block_unblock_roundtrip(data):
    _, x, _ = data
    xb, grid = block_with_halo(x, (16, 16, 16))
    assert xb.shape == (2 * 2 * 3 * 4, 18, 18, 18, 5)
    core = xb[:, 1:-1, 1:-1, 1:-1, :]
    np.testing.assert_array_equal(np.asarray(unblock(core, grid)),
                                  np.asarray(x))


def test_halo_is_neighbor_edge(data):
    _, x, _ = data
    xb, grid = block_with_halo(x, (16, 16, 16))
    # block (0,0,0) of batch 0: lower D halo plane == x[0, 16] slice
    np.testing.assert_array_equal(np.asarray(xb[0, -1, 1:-1, 1:-1]),
                                  np.asarray(x[0, 16, :16, :16]))
    # volume border halo is zeros (SAME semantics)
    assert float(jnp.sum(jnp.abs(xb[0, 0]))) == 0.0


@pytest.mark.parametrize("blocks", [(16, 16, 16), (16, 24, 32)])
def test_conv_same_parity(data, blocks):
    _, x, w = data
    ref = _conv(x, w)
    got = blocked_conv_same(x, w, blocks=blocks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("st", [(2, 2, 2), (2, 2, 1), (1, 2, 2)])
def test_conv_strided_parity(data, st):
    _, x, w = data
    ref = _conv(x, w, st)
    got = blocked_conv_same(x, w, blocks=(16, 16, 16), strides=st)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_stride_ok_gate():
    assert stride_ok((32, 32, 32), (16, 16, 16), (2, 2, 2))
    assert not stride_ok((32, 32, 32), (15, 16, 16), (2, 1, 1))
    # odd blocks only matter on strided axes
    assert stride_ok((30, 32, 32), (15, 16, 16), (1, 2, 2))
    assert stride_ok((32, 32, 32), (16, 16, 16), (1, 1, 1))


def test_rehalo_matches_fresh_pack(data):
    _, x, _ = data
    xb, grid = block_with_halo(x, (16, 16, 16))
    core = xb[:, 1:-1, 1:-1, 1:-1, :]
    np.testing.assert_array_equal(np.asarray(rehalo(core, grid)),
                                  np.asarray(xb))


@pytest.mark.parametrize("st1", [(1, 1, 1), (2, 2, 2)])
def test_stage_parity(data, st1):
    rng, x, _ = data
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 6, 8)) * 0.2, jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    o1 = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32)
    o2 = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
    ref = _block(_block(x, w1, s1, o1, st1), w2, s2, o2)
    got = blocked_stage(x, w1, s1, o1, w2, s2, o2, blocks=(16, 16, 16),
                        stride1=st1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_stage_grad_parity(data):
    rng, x, _ = data
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 6, 8)) * 0.2, jnp.float32)
    s1 = jnp.ones((6,), jnp.float32)
    o1 = jnp.zeros((6,), jnp.float32)
    s2 = jnp.ones((8,), jnp.float32)
    o2 = jnp.zeros((8,), jnp.float32)

    def loss_blocked(w):
        return jnp.mean(jnp.square(blocked_stage(
            x, w, s1, o1, w2, s2, o2, blocks=(16, 16, 16))))

    def loss_ref(w):
        return jnp.mean(jnp.square(_block(_block(x, w, s1, o1), w2, s2, o2)))

    g1 = jax.grad(loss_blocked)(w1)
    g2 = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-3)


def test_pick_blocks():
    assert pick_blocks((128, 128, 128)) == (32, 32, 32)
    assert pick_blocks((96, 160, 160)) == (32, 32, 32)
    assert pick_blocks((28, 40, 40)) is None  # nothing useful to split


def test_conv_same_parity_w_whole(data):
    # W-whole anisotropic blocks: the W axis is unsplit (n=1), so its halo
    # degenerates to the SAME zero-pad — the route the models use
    _, x, w = data
    ref = _conv(x, w)
    got = blocked_conv_same(x, w, blocks=(16, 16, 64))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_aniso_blocks_planner():
    from lifelong_nnunet_tpu.ops.blocked_conv import aniso_blocks
    # CT fullres stage geometry: split D/H at 32, keep W whole
    assert aniso_blocks((128, 128, 128)) == (32, 32, 128)
    assert aniso_blocks((64, 64, 64)) == (32, 32, 64)
    # stride-2 axes need even blocks
    assert aniso_blocks((128, 128, 128), (2, 2, 2)) == (32, 32, 128)
    # small volumes still split if divisible; degenerate ones don't
    assert aniso_blocks((20, 24, 20)) == (10, 12, 20)
    assert aniso_blocks((8, 8, 8)) is None


@pytest.mark.parametrize("grad", [False, True])
def test_unet_blocked_conv_route_parity(monkeypatch, grad):
    """GenericUNet(blocked_conv=True) == baseline on identical params —
    forward AND gradients (the packed route carries a custom VJP).

    The packed route drops the conv bias (absorbed exactly by IN, like the
    Pallas path), so biases are zeroed for the comparison; shapes chosen so
    the route engages on the full-resolution stages (32^3 -> bs=16, 2*8=16
    blocks).  LNN_BLOCKED_FORCE=1 + interpret-mode pallas exercise the TPU
    route on CPU."""
    import lifelong_nnunet_tpu.ops.pallas.block_pack as bpk
    from lifelong_nnunet_tpu.models.unet import GenericUNet
    monkeypatch.setenv("LNN_BLOCKED_FORCE", "1")
    real = bpk.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return real(*a, **k)

    monkeypatch.setattr(bpk.pl, "pallas_call", patched)
    bpk.pack_blocks._clear_cache()
    bpk.unpack_blocks._clear_cache()
    m = GenericUNet(num_classes=3,
                    pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
                    conv_kernel_sizes=((3, 3, 3),) * 3,
                    base_num_features=8, max_num_features=32,
                    deep_supervision=False)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 32, 32, 32, 1)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.zeros_like(v)
        if (path[-2].key == "Conv_0" and path[-1].key == "bias") else v,
        params)
    mb = m.clone(blocked_conv=True)
    # the route must actually engage on the full-resolution stages
    from lifelong_nnunet_tpu.models.unet import ConvNormAct
    probe = ConvNormAct(8, (3, 3, 3), (1, 1, 1), blocked_conv=True)
    assert probe._packed_bs(jnp.zeros((2, 32, 32, 32, 8))) == 16
    if not grad:
        ref = m.apply(params, x)[0]
        got = mb.apply(params, x)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)
        return

    def loss(mm, p):
        y = mm.apply(p, x)[0]
        return jnp.mean(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(m, p))(params)
    g_got = jax.grad(lambda p: loss(mb, p))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = dict((jax.tree_util.keystr(k), v) for k, v in
                    jax.tree_util.tree_leaves_with_path(g_got))
    for k, vr in flat_ref:
        ks = jax.tree_util.keystr(k)
        if "Conv_0" in ks and ks.endswith("['bias']"):
            continue  # bias grads are zero on the fused route (documented)
        np.testing.assert_allclose(
            np.asarray(flat_got[ks]), np.asarray(vr), atol=5e-4, rtol=5e-3,
            err_msg=ks)
