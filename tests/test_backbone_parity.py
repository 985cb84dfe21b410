"""DarkNet/VGG/GN backbone parity vs reference torch + backbone-only
checkpoint import paths."""

import os
import sys

import numpy as np
import pytest

import _refutil

pytestmark = pytest.mark.skipif(not _refutil.available(),
                                reason='reference repo not available')
torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def refmod():
    _refutil.import_reference()
    import backbone as ref_bb
    return ref_bb


def _convert_backbone(cfg, net):
    from yolact_tpu.convert.torch_import import convert_state_dict
    sd = {f'backbone.{k}': v.detach().numpy()
          for k, v in net.state_dict().items()}
    variables, unhandled = convert_state_dict(cfg, sd)
    assert not unhandled, unhandled
    return variables


def test_darknet_backbone_parity(refmod, rng):
    from yolact_tpu.config import get_config
    from yolact_tpu.models.darknet import DarkNetBackbone

    torch.manual_seed(1)
    net = refmod.DarkNetBackbone([1, 1, 2, 1, 1])
    net.eval()
    cfg = get_config('yolact_darknet53').copy(
        backbone=get_config('yolact_darknet53').backbone.copy(
            args=((1, 1, 2, 1, 1),)))
    variables = _convert_backbone(cfg, net)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    bb = DarkNetBackbone(layers=(1, 1, 2, 1, 1))
    ours = bb.apply({'params': variables['params']['backbone'],
                     'batch_stats': variables['batch_stats']['backbone']},
                    np.transpose(x, (0, 2, 3, 1)), train=False)
    for o, r in zip(ours, ref_outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.transpose(r.numpy(), (0, 2, 3, 1)),
                                   atol=2e-4)


def test_vgg_backbone_parity(refmod, rng):
    from yolact_tpu.config import VGG16_ARCH, get_config
    from yolact_tpu.models.vgg import VGGBackbone

    ref_arch = [[64, 64],
                ['M', 128, 128],
                ['M', 256, 256, 256],
                [('M', {'kernel_size': 2, 'stride': 2, 'ceil_mode': True}),
                 512, 512, 512],
                ['M', 512, 512, 512],
                [('M', {'kernel_size': 3, 'stride': 1, 'padding': 1}),
                 (1024, {'kernel_size': 3, 'padding': 6, 'dilation': 6}),
                 (1024, {'kernel_size': 1})]]
    torch.manual_seed(2)
    net = refmod.VGGBackbone(ref_arch, extra_args=[(256, 2)], norm_layers=[3])
    net.eval()

    cfg = get_config('yolact_base').copy(
        backbone=get_config('yolact_base').backbone.copy(
            type='vgg',
            args=(VGG16_ARCH, ((256, 2),), (3,)),
            selected_layers=(3, 5)))
    variables = _convert_backbone(cfg, net)

    x = rng.rand(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    bb = VGGBackbone(arch=VGG16_ARCH, extra_args=((256, 2),),
                     norm_layers=(3,))
    ours = bb.apply({'params': variables['params']['backbone'],
                     'batch_stats': variables['batch_stats']['backbone']},
                    np.transpose(x, (0, 2, 3, 1)), train=False)
    assert len(ours) == len(ref_outs)
    for i, (o, r) in enumerate(zip(ours, ref_outs)):
        np.testing.assert_allclose(np.asarray(o),
                                   np.transpose(r.numpy(), (0, 2, 3, 1)),
                                   atol=3e-4, err_msg=f'stage {i}')


def test_resnet_gn_backbone_parity(refmod, rng):
    from yolact_tpu.config import get_config
    from yolact_tpu.models.resnet import ResNetBackbone

    torch.manual_seed(3)
    net = refmod.ResNetBackboneGN([1, 1, 1, 1])
    net.eval()
    cfg = get_config('yolact_base').copy(
        backbone=get_config('yolact_base').backbone.copy(
            type='resnet_gn', args=((1, 1, 1, 1),)))
    variables = _convert_backbone(cfg, net)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    bb = ResNetBackbone(layers=(1, 1, 1, 1), norm='gn')
    ours = bb.apply({'params': variables['params']['backbone']},
                    np.transpose(x, (0, 2, 3, 1)), train=False)
    for o, r in zip(ours, ref_outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.transpose(r.numpy(), (0, 2, 3, 1)),
                                   atol=2e-4)


def test_torchvision_resnet_import(refmod, rng):
    """layerN-style (torchvision) backbone checkpoints load via
    load_backbone_weights + merge_backbone."""
    from yolact_tpu.config import get_config
    from yolact_tpu.convert.backbone_import import (merge_backbone,
                                                    resnet_backbone_sd)
    from yolact_tpu.convert.torch_import import convert_state_dict
    from yolact_tpu.models.resnet import ResNetBackbone

    torch.manual_seed(4)
    net = refmod.ResNetBackbone([1, 1, 1, 1])
    net.eval()
    # emulate torchvision naming: layers.N. -> layer{N+1}.
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith('layers.'):
            parts = k.split('.')
            k = f'layer{int(parts[1]) + 1}.' + '.'.join(parts[2:])
        sd[k] = v.detach().numpy()
    sd['fc.weight'] = np.zeros((10, 2048), np.float32)  # must be dropped

    cfg = get_config('yolact_base').copy(
        backbone=get_config('yolact_base').backbone.copy(args=((1, 1, 1, 1),)))
    remapped = resnet_backbone_sd(sd)
    variables, unhandled = convert_state_dict(
        cfg, {f'backbone.{k}': v for k, v in remapped.items()})
    assert not unhandled

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    bb = ResNetBackbone(layers=(1, 1, 1, 1))
    ours = bb.apply({'params': variables['params']['backbone'],
                     'batch_stats': variables['batch_stats']['backbone']},
                    np.transpose(x, (0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(ours[-1]),
        np.transpose(ref_outs[-1].numpy(), (0, 2, 3, 1)), atol=2e-4)


def test_resnet_atrous_backbone_parity(refmod, rng):
    """Atrous (dilated) stages: the reference passes the accumulated
    dilation only to block 0 of each stage (backbone.py:114 vs :118 —
    blocks i>0 keep dilation=1); ours must reproduce that exactly."""
    from yolact_tpu.config import get_config
    from yolact_tpu.models.resnet import ResNetBackbone

    torch.manual_seed(3)
    # 2 blocks/stage so the i>0 dilation default is exercised; stage 2 and
    # 3 atrous so the dilation ACCUMULATES (2 then 3)
    net = refmod.ResNetBackbone([2, 2, 2, 2], atrous_layers=[2, 3])
    net.eval()
    cfg = get_config('yolact_base').copy(
        backbone=get_config('yolact_base').backbone.copy(
            args=((2, 2, 2, 2), (0, 0, 0, 0), 1, (2, 3))))
    variables = _convert_backbone(cfg, net)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(torch.from_numpy(x))
    bb = ResNetBackbone(layers=(2, 2, 2, 2), atrous_layers=(2, 3))
    ours = bb.apply({'params': variables['params']['backbone'],
                     'batch_stats': variables['batch_stats']['backbone']},
                    np.transpose(x, (0, 2, 3, 1)), train=False)
    assert len(ours) == len(ref_outs)
    for o, r in zip(ours, ref_outs):
        assert o.shape[1:3] == tuple(r.shape[2:]), (o.shape, r.shape)
        np.testing.assert_allclose(np.asarray(o),
                                   np.transpose(r.numpy(), (0, 2, 3, 1)),
                                   atol=2e-4)


def test_specnet_deconv_parity(rng):
    """make_net-style deconv entries: torch ConvTranspose2d defaults
    stride=1 (utils/functions.py:196) — an implicit-stride entry like
    (8, -2, ()) must match, and explicit strides keep working."""
    from yolact_tpu.models.layers import SpecNet

    spec = ((8, 3, (('padding', 1),)),
            (8, -2, ()),                       # implicit stride -> 1
            (8, -2, (('stride', 2),)))         # explicit stride 2
    ref_layers = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1), torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(8, 8, 2), torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(8, 8, 2, stride=2), torch.nn.ReLU())
    torch.manual_seed(0)
    for m in ref_layers:
        if hasattr(m, 'weight'):
            torch.nn.init.normal_(m.weight, std=0.1)
            torch.nn.init.normal_(m.bias, std=0.1)
    ref_layers.eval()

    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref_layers(torch.from_numpy(x)).numpy()

    import jax
    net = SpecNet(spec)
    net.init(jax.random.PRNGKey(0), np.transpose(x, (0, 2, 3, 1)))
    # map torch weights in: conv OIHW->HWIO, deconv IOHW->HWOI
    from yolact_tpu.convert.torch_import import _conv_w, _deconv_w

    def entry(m, deconv):
        w = m.weight.detach().numpy()
        return {'conv': {'kernel': _deconv_w(w) if deconv else _conv_w(w),
                         'bias': m.bias.detach().numpy()}}

    params = {'layers_0': entry(ref_layers[0], False),
              'layers_2': entry(ref_layers[2], True),
              'layers_4': entry(ref_layers[4], True)}
    got = net.apply({'params': params}, np.transpose(x, (0, 2, 3, 1)))
    assert got.shape[1:3] == tuple(want.shape[2:])
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want, (0, 2, 3, 1)), atol=2e-5)

    # and the static shape helper agrees
    from yolact_tpu.ops.anchors import spec_out_hw
    assert spec_out_hw(spec, 16, 16) == tuple(want.shape[2:])


def test_load_backbone_weights_actually_merge(refmod, rng, tmp_path):
    """End-to-end pretrained-backbone init: load_backbone_weights +
    merge_backbone must CHANGE the random-init backbone params
    (regression: a (variables, unhandled) tuple was silently treated as
    an empty dict and fresh runs trained from random init)."""
    import jax
    from yolact_tpu.config import get_config
    from yolact_tpu.convert.backbone_import import (load_backbone_weights,
                                                    merge_backbone)
    from yolact_tpu.models.yolact import init_params

    torch.manual_seed(5)
    net = refmod.ResNetBackbone([1, 1, 1, 1])
    pth = str(tmp_path / 'resnet_tiny.pth')
    torch.save(net.state_dict(), pth)  # reference layers.N./conv1. layout

    cfg = get_config('yolact_base').copy(
        max_size=128,
        backbone=get_config('yolact_base').backbone.copy(
            args=((1, 1, 1, 1),)))
    model, variables = init_params(cfg, seed=0)
    before = np.asarray(
        variables['params']['backbone']['conv1']['conv']['kernel']).copy()
    merged = merge_backbone(variables, load_backbone_weights(cfg, pth))
    after = np.asarray(
        merged['params']['backbone']['conv1']['conv']['kernel'])
    assert not np.allclose(before, after), \
        'pretrained backbone weights were not merged'
    want = np.transpose(net.state_dict()['conv1.weight'].numpy(),
                        (2, 3, 1, 0))
    np.testing.assert_allclose(after, want, atol=1e-6)

    import pytest as _pytest
    with _pytest.raises(TypeError):
        merge_backbone(variables, (variables, set()))  # the old bug shape
