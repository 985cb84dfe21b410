"""Pallas kernels vs their XLA references (run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def test_mask_assembly_matches_xla(rng):
    from yolact_tpu.kernels.mask_assembly import (assemble_masks_pallas,
                                                  assemble_masks_xla)
    Hp = Wp = 16
    Md, D = 8, 50
    proto = jnp.asarray(rng.rand(Hp, Wp, Md), jnp.float32)
    coeffs = jnp.asarray(np.tanh(rng.randn(D, Md)), jnp.float32)
    xy1 = rng.rand(D, 2) * 0.5
    wh = rng.rand(D, 2) * 0.4 + 0.05
    boxes = jnp.asarray(np.concatenate([xy1, xy1 + wh], 1), jnp.float32)

    want = np.asarray(assemble_masks_xla(proto, coeffs, boxes))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(assemble_masks_pallas(proto, coeffs, boxes))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_iou_max_matches_xla(rng):
    from yolact_tpu.detect.detection import _triu_max
    from yolact_tpu.kernels.nms_pallas import nms_iou_max_pallas
    from yolact_tpu.ops.boxes import jaccard

    C, K = 4, 128
    xy1 = rng.rand(C, K, 2) * 0.6
    wh = rng.rand(C, K, 2) * 0.3 + 0.02
    boxes = jnp.asarray(np.concatenate([xy1, xy1 + wh], -1), jnp.float32)

    want = np.asarray(_triu_max(jaccard(boxes, boxes)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nms_iou_max_pallas(boxes))
    np.testing.assert_allclose(got, want, atol=1e-5)
