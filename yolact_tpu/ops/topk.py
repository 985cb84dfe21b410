"""Exact lexicographic top-k: order by (value descending, index ascending).

The matcher needs each gt's top-(G+1) candidate priors in exactly the
order the reference's ``overlaps.max()`` / argmax tie-breaking visits them
(``layers/box_utils.py:189-207``): highest IoU first, ties resolved to the
LOWEST prior index.  ``lax.top_k`` guarantees that order but costs a full
per-segment sort; ``approx_max_k`` is fast but its tie order is arbitrary
on TPU (and most priors tie at IoU 0 for any given gt, so this matters).

``top_k_lex`` instead runs k passes of a variadic lexicographic
max-reduce where pass j only considers elements strictly after pass
j-1's winner in (value desc, index asc) order — no suppression mask is
materialized, so each pass is one fused bandwidth-bound read of the
operand.  At the matcher's shape ([8, 32, 19248] -> k=33) this measures
2.5x faster than the best sort-based scheme tried (segmented two-phase
top_k + 2-key merge; see NOTES.md) and is bit-identical on ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lex_max(values, indices, axis):
    """Max by (value desc, index asc) along ``axis``.

    Two sibling reduces (max, then min index among the maxima) rather
    than one variadic ``lax.reduce`` with a tuple combiner: XLA fuses
    them into a single pass anyway, and the variadic form CHECK-fails
    XLA:CPU inside SPMD-partitioned programs (observed aborting the
    spatial-split train test when torch is co-loaded in the process).
    """
    big = jnp.asarray(jnp.iinfo(indices.dtype).max, indices.dtype)
    mv = jnp.max(values, axis=axis)
    at_max = values == jnp.expand_dims(mv, axis)
    mi = jnp.min(jnp.where(at_max, indices, big), axis=axis)
    return mv, mi


def top_k_lex(values, k: int):
    """Exact top-k of ``values[..., P]`` by (value desc, index asc).

    Returns ``(vals, idx)`` of shape ``[..., k]`` — equal to
    ``jax.lax.top_k(values, k)`` (which breaks ties by ascending index)
    but computed as k fused max-reduce passes instead of a sort.

    Contract deltas vs ``lax.top_k`` (irrelevant to the matcher, which
    feeds finite IoUs with ordinary zeros):
      * NaN: ``lax.top_k``'s total order treats NaN as maximal; here
        NaNs are never eligible, and a row with fewer than k non-NaN
        elements yields (-inf, P) sentinel pairs for the remainder.
      * signed zero: ``lax.top_k`` orders +0.0 before -0.0; here they
        compare equal and tie-break by ascending index.
    """
    P = values.shape[-1]
    if k > P:
        raise ValueError(f'k={k} > last dim {P}')
    values = jnp.asarray(values)
    idx = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32), values.shape)
    batch_shape = values.shape[:-1]

    def body(j, state):
        vals, idxs, last_v, last_i = state
        elig = (values < last_v[..., None]) | \
            ((values == last_v[..., None]) & (idx > last_i[..., None]))
        mv, mi = _lex_max(jnp.where(elig, values, -jnp.inf),
                          jnp.where(elig, idx, P), values.ndim - 1)
        return (jax.lax.dynamic_update_index_in_dim(vals, mv, j, vals.ndim - 1),
                jax.lax.dynamic_update_index_in_dim(idxs, mi, j, idxs.ndim - 1),
                mv, mi)

    init = (jnp.zeros(batch_shape + (k,), values.dtype),
            jnp.zeros(batch_shape + (k,), jnp.int32),
            jnp.full(batch_shape, jnp.inf, values.dtype),
            jnp.full(batch_shape, -1, jnp.int32))
    vals, idxs, _, _ = jax.lax.fori_loop(0, k, body, init)
    return vals, idxs
