"""Kernel unit tests: fused ops vs pure-jnp references (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legommenders_tpu.ops.core import (
    masked_softmax, masked_mean, masked_max,
)
from legommenders_tpu.ops.pallas_additive import (
    additive_attention_fused, _forward_jnp, _forward_pallas,
)


@pytest.fixture
def add_inputs(rng):
    N, L, D, H = 37, 12, 16, 32
    x = rng.normal(size=(N, L, D)).astype(np.float32)
    mask = (rng.random((N, L)) < 0.8).astype(np.float32)
    mask[0] = 0  # an all-masked row
    mask[1] = 1
    w1 = rng.normal(size=(D, H)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(H,)).astype(np.float32) * 0.1
    return map(jnp.asarray, (x, mask, w1, b1, w2))


def test_masked_softmax_matches_exp_formula(rng):
    s = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    m = jnp.asarray((rng.random((5, 7)) < 0.7).astype(np.float32))
    got = masked_softmax(s, m)
    # reference formula: exp(s)*mask / (sum + eps)
    e = np.exp(np.asarray(s)) * np.asarray(m)
    want = e / (e.sum(-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_additive_fused_matches_jnp(add_inputs):
    x, mask, w1, b1, w2 = add_inputs
    got = additive_attention_fused(x, mask, w1, b1, w2)
    want = _forward_jnp(x, mask, w1, b1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # all-masked row -> zeros
    np.testing.assert_allclose(np.asarray(got[0]), 0.0, atol=1e-6)


def test_additive_fused_pallas_interpret(add_inputs):
    """Pallas kernel in interpreter mode (CPU) vs jnp path."""
    x, mask, w1, b1, w2 = add_inputs
    from jax.experimental import pallas as pl  # noqa: F401
    import legommenders_tpu.ops.pallas_additive as mod
    # run the pallas path with interpret via monkeypatched pallas_call
    import functools
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = mod._forward_pallas(x, mask, w1, b1, w2, tile_n=16)
    finally:
        pl.pallas_call = orig
    want = _forward_jnp(x, mask, w1, b1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_additive_fused_grads(add_inputs):
    x, mask, w1, b1, w2 = add_inputs

    def loss_fused(x, w1, b1, w2):
        return jnp.sum(additive_attention_fused(x, mask, w1, b1, w2) ** 2)

    def loss_ref(x, w1, b1, w2):
        return jnp.sum(_forward_jnp(x, mask, w1, b1, w2) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_masked_mean_max(rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 8)).astype(np.float32))
    m = jnp.asarray((rng.random((4, 6)) < 0.6).astype(np.float32))
    mean = masked_mean(x, m)
    mx = masked_max(x, m)
    for i in range(4):
        idx = np.asarray(m[i]) > 0
        if idx.sum() == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(mean[i]), np.asarray(x[i])[idx].mean(0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mx[i]), np.asarray(x[i])[idx].max(0), rtol=1e-5)
