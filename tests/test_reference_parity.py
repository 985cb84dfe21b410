"""Numerical parity against the reference PyTorch implementation.

These tests treat ``/root/reference`` as a black-box oracle: build the torch
model with random weights, convert the state_dict with our converter, run
both on the same input, and compare outputs.  They validate the backbone,
FPN, protonet, prediction heads, prior generation, and the checkpoint
converter in one shot.  Skipped automatically when the reference repo (or
CPU torch) is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference repo not available')

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def ref():
    """Import the reference yolact module with CUDA calls stubbed out."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.cuda.current_device = lambda: 0  # yolact.py:22 calls this on import
    # torchvision isn't installed; the reference only needs its Bottleneck
    # symbol (for use_prediction_module, which we never enable here).
    import types
    tv = types.ModuleType('torchvision')
    tv_models = types.ModuleType('torchvision.models')
    tv_resnet = types.ModuleType('torchvision.models.resnet')
    tv_resnet.Bottleneck = object
    tv.models = tv_models
    tv_models.resnet = tv_resnet
    tv_transforms = types.ModuleType('torchvision.transforms')
    tv.transforms = tv_transforms
    sys.modules.setdefault('torchvision.transforms', tv_transforms)
    sys.modules.setdefault('torchvision', tv)
    sys.modules.setdefault('torchvision.models', tv_models)
    sys.modules.setdefault('torchvision.models.resnet', tv_resnet)
    # pycocotools isn't installed either; data/__init__.py pulls it in via
    # data/coco.py but none of the model code paths touch it.
    pc = types.ModuleType('pycocotools')
    for sub in ('mask', 'coco', 'cocoeval'):
        m = types.ModuleType(f'pycocotools.{sub}')
        setattr(pc, sub, m)
        sys.modules.setdefault(f'pycocotools.{sub}', m)
    sys.modules['pycocotools.coco'].COCO = object
    sys.modules['pycocotools.cocoeval'].COCOeval = object
    sys.modules.setdefault('pycocotools', pc)
    import yolact as ref_yolact  # noqa
    import data.config as ref_config  # noqa
    return ref_yolact, ref_config


def tiny_ref_cfg(ref_config):
    """A tiny yolact_base-style reference config (reference Config object)."""
    cfg = ref_config.yolact_base_config.copy({
        'max_size': 128,
        'num_classes': 5,
        'backbone': ref_config.yolact_base_config.backbone.copy({
            'args': ([1, 1, 1, 1],),
            'pred_scales': [[6], [12], [24], [48], [96]],
        }),
        'mask_proto_net': [(8, 3, {'padding': 1}), (None, -2, {}), (8, 1, {})],
        'extra_head_net': [(16, 3, {'padding': 1})],
        'fpn': ref_config.yolact_base_config.fpn.copy({'num_features': 16}),
    })
    return cfg


@pytest.fixture(scope='module')
def tiny_pair(ref):
    """(our config, reference torch net in train mode, converted variables)."""
    ref_yolact, ref_config = ref
    sys.path.insert(0, os.path.dirname(__file__))
    from _tiny import tiny_resnet_config

    ref_config.set_cfg('yolact_base_config')
    ref_config.cfg.replace(tiny_ref_cfg(ref_config))

    torch.manual_seed(0)
    net = ref_yolact.Yolact()
    net.train()  # raw pred_outs branch

    from yolact_tpu.convert.torch_import import convert_state_dict
    cfg = tiny_resnet_config()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables, unhandled = convert_state_dict(cfg, sd)
    assert not unhandled, f'unconverted keys: {unhandled}'
    return cfg, net, variables


def _run_both(cfg, net, variables, seed=0):
    import jax
    from yolact_tpu.models.yolact import Yolact

    rng = np.random.RandomState(seed)
    x = rng.rand(1, 3, cfg.max_size, cfg.max_size).astype(np.float32)

    with torch.no_grad():
        ref_out = net(torch.from_numpy(x))

    model = Yolact(cfg)
    ours = model.apply(
        {'params': variables['params'], 'batch_stats': variables['batch_stats']},
        np.transpose(x, (0, 2, 3, 1)), train=True,
        mutable=['batch_stats'])[0]
    return ref_out, ours


def test_forward_parity(tiny_pair):
    cfg, net, variables = tiny_pair
    ref_out, ours = _run_both(cfg, net, variables)

    np.testing.assert_allclose(np.asarray(ours['priors']),
                               ref_out['priors'].numpy(), atol=1e-6)
    for key, atol in (('loc', 2e-4), ('conf', 2e-4), ('mask', 2e-4)):
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_out[key].numpy(), atol=atol,
            err_msg=key)
    np.testing.assert_allclose(np.asarray(ours['proto']),
                               ref_out['proto'].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours['segm']),
        np.transpose(ref_out['segm'].numpy(), (0, 2, 3, 1)), atol=2e-4)


def test_eval_mode_bn_parity(tiny_pair):
    """train=False must use running stats exactly like module.eval().

    Runs just the backbones (the reference eval branch would invoke Detect,
    which needs the Cython NMS) after perturbing the running stats away from
    their (0, 1) init so the eval path actually exercises them.
    """
    cfg, net, variables = tiny_pair
    from yolact_tpu.models.resnet import ResNetBackbone

    rng = np.random.RandomState(7)
    x = rng.rand(1, 3, cfg.max_size, cfg.max_size).astype(np.float32)

    net.eval()
    try:
        with torch.no_grad():
            ref_outs = net.backbone(torch.from_numpy(x))
    finally:
        net.train()

    bb = ResNetBackbone(layers=(1, 1, 1, 1), num_stages=4)
    ours = bb.apply(
        {'params': variables['params']['backbone'],
         'batch_stats': variables['batch_stats']['backbone']},
        np.transpose(x, (0, 2, 3, 1)), train=False)
    assert len(ours) == len(ref_outs)
    for o, r in zip(ours, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o), np.transpose(r.numpy(), (0, 2, 3, 1)), atol=2e-4)


def test_prototypes_as_features_parity(ref):
    """mask_proto_prototypes_as_features (yolact.py:86,591-622): activated
    prototypes progressively resized and concatenated to each head input."""
    import sys as _sys
    ref_yolact, ref_config = ref
    _sys.path.insert(0, os.path.dirname(__file__))
    from _tiny import tiny_resnet_config

    ref_config.set_cfg('yolact_base_config')
    rc = tiny_ref_cfg(ref_config).copy({
        'mask_proto_prototypes_as_features': True})
    ref_config.cfg.replace(rc)

    torch.manual_seed(1)
    net = ref_yolact.Yolact()
    net.train()

    from yolact_tpu.convert.torch_import import convert_state_dict
    cfg = tiny_resnet_config().copy(mask_proto_prototypes_as_features=True)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables, unhandled = convert_state_dict(cfg, sd)
    assert not unhandled, f'unconverted keys: {unhandled}'

    ref_out, ours = _run_both(cfg, net, variables, seed=3)
    for key, atol in (('loc', 3e-4), ('conf', 3e-4), ('mask', 3e-4)):
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_out[key].numpy(), atol=atol,
            err_msg=key)


def test_yolo_regressor_head_parity(ref):
    """use_yolo_regressors squashes the head's xy output
    (sigmoid - 0.5, / conv size, yolact.py:185-188) — oracle the 'loc'
    output against the reference with the flag ON."""
    ref_yolact, ref_config = ref
    sys.path.insert(0, os.path.dirname(__file__))
    from _tiny import tiny_resnet_config

    saved = ref_config.Config(vars(ref_config.cfg).copy())
    ref_config.cfg.replace(tiny_ref_cfg(ref_config))
    ref_config.cfg.replace(ref_config.cfg.copy(
        {'use_yolo_regressors': True}))
    try:
        torch.manual_seed(3)
        net = ref_yolact.Yolact()
        net.train()

        from yolact_tpu.convert.torch_import import convert_state_dict
        cfg = tiny_resnet_config(use_yolo_regressors=True)
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        variables, unhandled = convert_state_dict(cfg, sd)
        assert not unhandled

        ref_out, ours = _run_both(cfg, net, variables, seed=3)
        np.testing.assert_allclose(np.asarray(ours['loc']),
                                   ref_out['loc'].numpy(), atol=2e-4)
        # xy really is squashed into (-0.5, 0.5)/conv form, not raw
        assert float(np.abs(np.asarray(ours['loc'])[..., :2]).max()) < 0.5
    finally:
        ref_config.cfg.replace(saved)
