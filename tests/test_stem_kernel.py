"""Pallas s2d stem conv kernel vs the XLA conv formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from yolact_tpu.kernels.stem import (_conv_xla, stem_conv_s2d,
                                     stem_conv_s2d_pallas)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * 0.1, dtype)


def test_pallas_matches_xla_f32():
    x = _rand((2, 64, 64, 12), 0)
    w = _rand((4, 4, 12, 64), 1)
    out = stem_conv_s2d_pallas(x, w, interpret=True)
    ref = _conv_xla(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_bf16():
    x = _rand((1, 40, 40, 12), 2, jnp.bfloat16)
    w = _rand((4, 4, 12, 64), 3, jnp.bfloat16)
    out = stem_conv_s2d_pallas(x, w, interpret=True)
    ref = _conv_xla(x, w)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.05)


def test_non_multiple_of_block_shapes():
    # h=w=37: exercises row-block padding (rb=32 -> nb=2) + x-pad to 40
    x = _rand((1, 37, 37, 12), 4)
    w = _rand((4, 4, 12, 16), 5)
    out = stem_conv_s2d_pallas(x, w, interpret=True)
    ref = _conv_xla(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_xla_grads():
    x = _rand((1, 24, 24, 12), 6)
    w = _rand((4, 4, 12, 8), 7)

    def loss_pallas(x, w):
        return jnp.sum(stem_conv_s2d(x, w) ** 2)

    def loss_xla(x, w):
        return jnp.sum(_conv_xla(x, w) ** 2)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-5, atol=1e-4)
