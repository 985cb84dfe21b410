"""Mechanical CLI parity oracle: the effective argparse defaults of the
reference's eval.py / train.py (extracted by AST walk, so the reference
needn't be importable) must match ours for every shared flag.

This is the class of bug that once shipped: `--no_crop` declared with
`default=False, action='store_false'` silently turned mask cropping OFF
for every run because the reference's `set_defaults(crop=True)` wasn't
mirrored.
"""

import ast
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import _refutil

pytestmark = pytest.mark.skipif(not _refutil.available(),
                                reason='reference repo not available')


def _ref_defaults(path):
    """Effective argparse defaults from add_argument/set_defaults calls
    (literal defaults only; parser-level set_defaults wins, like
    argparse)."""
    tree = ast.parse(open(path).read())
    arg_defaults = {}
    set_defaults = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call) or \
                not isinstance(node.func, ast.Attribute):
            continue
        if node.func.attr == 'add_argument':
            opts = [a.value for a in node.args
                    if isinstance(a, ast.Constant)
                    and str(a.value).startswith('--')]
            if not opts:
                continue
            kw = {k.arg: k.value for k in node.keywords}
            dest = None
            if 'dest' in kw and isinstance(kw['dest'], ast.Constant):
                dest = kw['dest'].value
            if dest is None:
                dest = opts[0].lstrip('-').replace('-', '_')
            default = None
            if 'default' in kw:
                try:
                    default = ast.literal_eval(kw['default'])
                except ValueError:
                    continue  # non-literal default: out of scope
            action = None
            if 'action' in kw and isinstance(kw['action'], ast.Constant):
                action = kw['action'].value
            if default is None and action == 'store_true':
                default = False
            elif default is None and action == 'store_false':
                default = True
            arg_defaults[dest] = default
        elif node.func.attr == 'set_defaults':
            for k in node.keywords:
                try:
                    set_defaults[k.arg] = ast.literal_eval(k.value)
                except ValueError:
                    continue
    # parser-level defaults override argument-level ones (argparse docs)
    arg_defaults.update(set_defaults)
    return arg_defaults


# flags whose defaults deliberately differ / don't apply, with the reason
EVAL_DELTAS = {
    'no_hash': 'vestigial reference set_defaults entry with no '
               'add_argument and no consumer (eval.py:118 only)',
    'trained_model': "the reference default is a stale SSD300 path "
                     "('weights/ssd300_mAP_77.43_v2.pth', a fork "
                     "leftover); ours defaults to the published "
                     "yolact_base checkpoint name",
}
TRAIN_DELTAS = {}


def _compare(ref, ours_ns, deltas):
    bad = []
    for dest, rdef in ref.items():
        if dest in deltas:
            continue
        if not hasattr(ours_ns, dest):
            bad.append((dest, 'flag missing from our CLI'))
            continue
        odef = getattr(ours_ns, dest)
        if odef != rdef:
            bad.append((dest, f'ref default={rdef!r} ours={odef!r}'))
    return bad


def test_eval_cli_defaults_match_reference():
    from yolact_tpu.cli.eval import parse_args
    ref = _ref_defaults(os.path.join(_refutil.REF, 'eval.py'))
    bad = _compare(ref, parse_args([]), EVAL_DELTAS)
    assert not bad, bad


def test_train_cli_defaults_match_reference():
    from yolact_tpu.cli.train import parse_args
    ref = _ref_defaults(os.path.join(_refutil.REF, 'train.py'))
    bad = _compare(ref, parse_args([]), TRAIN_DELTAS)
    assert not bad, bad
