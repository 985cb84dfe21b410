"""Oracle: our APDataObject (eval/evaluator.py) vs the reference's
(eval.py:513-581) on random score streams — same 101-point interpolated
AP, including tie/edge handling."""

import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _refutil import import_reference


@pytest.fixture(scope='module')
def ref_eval():
    try:
        import_reference()
    except Exception as e:          # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')
    return importlib.import_module('eval')


def test_ap_data_object_oracle(ref_eval):
    from yolact_tpu.eval.evaluator import APDataObject

    for seed in range(20):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(0, 60))
        n_gt = int(rng.randint(0, 12))
        # quantized scores produce ties; is_true at random
        scores = np.round(rng.rand(n), 2)
        truth = rng.rand(n) > 0.6

        r = ref_eval.APDataObject()
        o = APDataObject()
        for s, t in zip(scores, truth):
            r.push(float(s), bool(t))
            o.push(float(s), bool(t))
        r.add_gt_positives(n_gt)
        o.add_gt_positives(n_gt)
        assert r.is_empty() == o.is_empty()
        np.testing.assert_allclose(o.get_ap(), r.get_ap(), rtol=0,
                                   atol=1e-12, err_msg=f'seed {seed}')


def test_ap_all_false_and_all_true(ref_eval):
    from yolact_tpu.eval.evaluator import APDataObject
    for truth_val in (True, False):
        r = ref_eval.APDataObject()
        o = APDataObject()
        for i in range(10):
            r.push(i / 10.0, truth_val)
            o.push(i / 10.0, truth_val)
        r.add_gt_positives(5)
        o.add_gt_positives(5)
        assert o.get_ap() == r.get_ap()
