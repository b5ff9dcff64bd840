"""DMA block pack/unpack (ops/pallas/block_pack) — correctness on CPU
(interpret mode) against the XLA composition.  The packed layout must make
the conv+IN+LReLU stage numerically identical to the direct pair; TPU
performance numbers live in RESULTS.md (round 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import lifelong_nnunet_tpu.ops.pallas.block_pack as bp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    real = bp.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return real(*a, **k)

    monkeypatch.setattr(bp.pl, "pallas_call", patched)
    bp.pack_blocks._clear_cache()
    bp.unpack_blocks._clear_cache()
    yield
    bp.pack_blocks._clear_cache()
    bp.unpack_blocks._clear_cache()


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
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    return rng, x, w


def test_pack_matches_reference_pack(interpret_pallas, data):
    """pack_blocks == blocked_conv.block_with_halo up to junk H rows/W cols."""
    from lifelong_nnunet_tpu.ops.blocked_conv import block_with_halo
    _, x, _ = data
    got = bp.pack_blocks(x, bs=8)
    ref, grid = block_with_halo(x, (8, 8, 8))
    assert got.shape == (2 * 2 * 3 * 2, 10, 16, 16, 5)
    np.testing.assert_array_equal(np.asarray(got[:, :, :10, :10, :]),
                                  np.asarray(ref))


def test_pack_conv_unpack_parity(interpret_pallas, data):
    _, x, w = data
    ref = _conv(x, w)
    xb = bp.pack_blocks(x, bs=8)
    y = lax.conv_general_dilated(
        xb, w, (1, 1, 1), bp.conv_pads(8),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = bp.unpack_blocks(y, 2, (2, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_unpack_roundtrip(interpret_pallas, data):
    _, x, _ = data
    xb = bp.pack_blocks(x, bs=8)
    core = xb[:, 1:-1, 1:9, 1:9, :]
    np.testing.assert_array_equal(
        np.asarray(bp.unpack_blocks(core, 2, (2, 3, 2))), np.asarray(x))


@pytest.mark.parametrize("st1", [(1, 1, 1), (2, 2, 2)])
def test_packed_stage_parity(interpret_pallas, data, st1):
    # cubic 16^3 so the second conv's block size exists for both strides
    rng, _, _ = data
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 5)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 6, 8)) * 0.2, jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    o1 = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32)
    o2 = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
    ref = _block(_block(x, w1, s1, o1, st1), w2, s2, o2)
    got = bp.packed_stage(x, w1, s1, o1, w2, s2, o2, bs=8, stride1=st1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_pick_bs():
    assert bp.pick_bs((128, 128, 128)) == 32
    assert bp.pick_bs((64, 64, 64)) == 32
    assert bp.pick_bs((16, 24, 16), prefer=(32, 16, 8)) == 8
    assert bp.pick_bs((20, 24, 20)) is None


@pytest.mark.parametrize("st", [(1, 1, 1), (2, 2, 2)])
def test_packed_conv_in_lrelu_fwd(interpret_pallas, data, st):
    rng, _, _ = data
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    of = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
    ref = _block(x, w, sc, of, st)
    got = bp.packed_conv_in_lrelu(x, w, sc, of, bs=8, strides=st)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("st", [(1, 1, 1), (2, 2, 2)])
def test_packed_conv_in_lrelu_vjp(interpret_pallas, data, st):
    """Custom VJP == autodiff of the XLA composition for every input."""
    rng, _, _ = data
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32)
    of = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)

    def loss_got(x, w, sc, of):
        return jnp.mean(jnp.square(
            bp.packed_conv_in_lrelu(x, w, sc, of, bs=8, strides=st)))

    def loss_ref(x, w, sc, of):
        return jnp.mean(jnp.square(_block(x, w, sc, of, st)))

    g_got = jax.grad(loss_got, argnums=(0, 1, 2, 3))(x, w, sc, of)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, sc, of)
    for a, b, name in zip(g_got, g_ref, ("dx", "dw", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=5e-3, err_msg=name)
