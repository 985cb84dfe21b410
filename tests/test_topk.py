"""top_k_lex: exact (value desc, index asc) top-k vs lax.top_k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolact_tpu.ops.topk import top_k_lex


def _check(values, k):
    rv, ri = jax.lax.top_k(jnp.asarray(values), k)
    lv, li = jax.jit(top_k_lex, static_argnums=1)(jnp.asarray(values), k)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(lv))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(li))


def test_random_matches_lax_top_k():
    rng = np.random.RandomState(0)
    _check(rng.rand(4, 7, 300).astype(np.float32), 9)


def test_heavy_ties_lowest_index_first():
    rng = np.random.RandomState(1)
    # quantized values -> long runs of exact ties (like IoU==0 rows)
    v = (np.round(rng.rand(5, 200) * 4) / 4).astype(np.float32)
    _check(v, 17)


def test_all_equal_row():
    v = np.full((3, 50), 0.25, np.float32)
    lv, li = top_k_lex(jnp.asarray(v), 6)
    np.testing.assert_array_equal(np.asarray(li),
                                  np.tile(np.arange(6), (3, 1)))
    np.testing.assert_array_equal(np.asarray(lv), np.full((3, 6), 0.25))


def test_k_equals_p_full_sort():
    rng = np.random.RandomState(2)
    _check(rng.rand(2, 12).astype(np.float32), 12)


def test_negative_and_sentinel_values():
    # matcher rows for padded gts are all -1.0
    v = np.full((2, 40), -1.0, np.float32)
    v[0, 7] = 0.5
    _check(v, 5)


def test_bfloat16_dtype():
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.rand(3, 64).astype(np.float32), jnp.bfloat16)
    rv, ri = jax.lax.top_k(v, 8)
    lv, li = top_k_lex(v, 8)
    np.testing.assert_array_equal(np.asarray(rv.astype(jnp.float32)),
                                  np.asarray(lv.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(li))
    assert lv.dtype == jnp.bfloat16


def test_k_too_large_raises():
    with pytest.raises(ValueError):
        top_k_lex(jnp.zeros((2, 5)), 6)
