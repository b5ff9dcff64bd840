"""Pallas fused InstanceNorm+LeakyReLU: forward/backward vs reference.
Runs in interpreter mode on CPU (pltpu.force_tpu_interpret_mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from lifelong_nnunet_tpu.ops.pallas.instance_norm import (
    instance_norm_leaky, instance_norm_leaky_nd, reference_instance_norm_leaky)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
    out = instance_norm_leaky(x, scale, bias)
    ref = reference_instance_norm_leaky(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_nd_wrapper():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
    scale = jnp.ones(8)
    bias = jnp.zeros(8)
    out = instance_norm_leaky_nd(x, scale, bias)
    ref = reference_instance_norm_leaky(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backward_matches_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.normal(size=8).astype(np.float32))

    def loss_pallas(x, s, b):
        return (instance_norm_leaky(x, s, b) ** 2).sum()

    def loss_ref(x, s, b):
        return (reference_instance_norm_leaky(x, s, b) ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_bf16_activation():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(1, 64, 8))).astype(jnp.bfloat16)
    out = instance_norm_leaky(x, jnp.ones(8), jnp.zeros(8))
    assert out.dtype == jnp.bfloat16
    ref = reference_instance_norm_leaky(x, jnp.ones(8), jnp.zeros(8))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
