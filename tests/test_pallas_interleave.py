"""Pallas 2x up-interleave (interpret mode) == lax.conv_transpose, incl.
gradients through the custom-vjp de-interleave kernel."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lifelong_nnunet_tpu.ops.pallas.interleave import (
    conv_transpose3d_matmul_pallas, shape_ok)


def _ref(x, w):
    return lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                              dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_matches_lax_conv_transpose():
    rng = np.random.RandomState(7)
    for shape, cout in (((2, 4, 8, 8, 6), 8), ((1, 3, 4, 16, 16), 8)):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        w = jnp.asarray(rng.normal(size=(2, 2, 2, shape[-1], cout)),
                        jnp.float32)
        assert shape_ok(x.shape, w.shape, jnp.float32)
        got = conv_transpose3d_matmul_pallas(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                                   rtol=1e-5, atol=1e-5)


def test_gradients_match():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 4, 8)), jnp.float32)

    def loss_p(x, w):
        return jnp.sum(jnp.square(
            conv_transpose3d_matmul_pallas(x, w, interpret=True)))

    def loss_r(x, w):
        return jnp.sum(jnp.square(_ref(x, w)))

    gx, gw = jax.grad(loss_p, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4,
                               atol=1e-4)


def test_gate_rejects_misaligned():
    assert not shape_ok((1, 2, 3, 3, 3), (2, 2, 2, 3, 3), jnp.float32)
    assert not shape_ok((1, 2, 4, 4, 4), (3, 3, 3, 4, 4), jnp.float32)
