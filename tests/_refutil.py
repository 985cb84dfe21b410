"""Helpers to import the reference implementation as a test oracle."""

import os
import sys
import types

REF = '/root/reference'


def import_reference():
    """Import reference modules with missing deps stubbed.  Returns the
    (yolact, config, box_utils, multibox_loss) modules or raises."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.cuda.current_device = lambda: 0

    tv = types.ModuleType('torchvision')
    tv_models = types.ModuleType('torchvision.models')
    tv_resnet = types.ModuleType('torchvision.models.resnet')
    tv_resnet.Bottleneck = object
    tv_transforms = types.ModuleType('torchvision.transforms')
    tv.models = tv_models
    tv.transforms = tv_transforms
    tv_models.resnet = tv_resnet
    for name, mod in (('torchvision', tv), ('torchvision.models', tv_models),
                      ('torchvision.models.resnet', tv_resnet),
                      ('torchvision.transforms', tv_transforms)):
        sys.modules.setdefault(name, mod)

    pc = types.ModuleType('pycocotools')
    for sub in ('mask', 'coco', 'cocoeval'):
        m = types.ModuleType(f'pycocotools.{sub}')
        setattr(pc, sub, m)
        sys.modules.setdefault(f'pycocotools.{sub}', m)
    sys.modules['pycocotools.coco'].COCO = object
    sys.modules['pycocotools.cocoeval'].COCOeval = object
    sys.modules.setdefault('pycocotools', pc)

    import yolact as ref_yolact
    import data.config as ref_config
    import layers.box_utils as ref_box_utils
    import layers.modules.multibox_loss as ref_mbl
    return ref_yolact, ref_config, ref_box_utils, ref_mbl


def available() -> bool:
    return os.path.isdir(REF)


def ref_dcn_v2_conv(x, offset, mask, weight, bias, stride, padding,
                    dilation=1, deformable_groups=1):
    """Pure-torch transcription of the reference CUDA DCN semantics
    (``external/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:26-54`` per-corner
    zero-OOB bilinear, ``:125-180`` tap/offset/mask channel layout).
    torch-differentiable — torch.autograd through this IS the reference
    backward (``dcn_v2_cuda.cu`` backward kernels) for grad oracles."""
    import torch

    def _pair(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    assert deformable_groups == 1
    B, Cin, H, W = x.shape
    Cout, _, K, _ = weight.shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    Ho = (H + 2 * ph - dh * (K - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (K - 1) - 1) // sw + 1
    K2 = K * K
    # NOTE: the reference builds conv_offset_mask WITHOUT dilation
    # (dcn_v2.py:104-110), so for an atrous DCN (padding=dilation>1)
    # its offset map is LARGER than the conv output and the CUDA
    # kernel reads scrambled memory — undefined behavior no shipped
    # config exercises (atrous_layers and dcn_layers never overlap).
    # Error loudly instead of reproducing UB.
    assert offset.shape == (B, 2 * K2, Ho, Wo), (
        f'offset {tuple(offset.shape)} != {(B, 2 * K2, Ho, Wo)} — '
        'atrous DCN offset-map mismatch (reference UB)')
    # offset channel 2t is dy_t, 2t+1 is dx_t for tap t = i*K+j
    # (im2col kernel reads them pairwise, dcn_v2_im2col_cuda.cu:170-173)
    off = offset.view(B, K2, 2, Ho, Wo)
    ti = (torch.arange(K2) // K).view(1, K2, 1, 1).float()
    tj = (torch.arange(K2) % K).view(1, K2, 1, 1).float()
    ys = ((torch.arange(Ho).float() * sh - ph).view(1, 1, Ho, 1)
          + ti * dh + off[:, :, 0])
    xs = ((torch.arange(Wo).float() * sw - pw).view(1, 1, 1, Wo)
          + tj * dw + off[:, :, 1])
    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    xflat = x.reshape(B, 1, Cin, H * W).expand(B, K2, Cin, H * W)
    cols = torch.zeros(B, K2, Cin, Ho, Wo, dtype=x.dtype)
    for ddy, wy in ((0, 1 - (ys - y0)), (1, ys - y0)):
        for ddx, wx in ((0, 1 - (xs - x0)), (1, xs - x0)):
            yc = y0.long() + ddy
            xc = x0.long() + ddx
            valid = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
            idx = (yc.clamp(0, H - 1) * W + xc.clamp(0, W - 1))
            idx = idx.view(B, K2, 1, Ho * Wo).expand(B, K2, Cin, Ho * Wo)
            v = torch.gather(xflat, 3, idx).view(B, K2, Cin, Ho, Wo)
            cols = cols + v * (wy * wx * valid.float()).unsqueeze(2)
    cols = cols * mask.unsqueeze(2)
    out = torch.einsum('bkcp,ock->bop',
                       cols.reshape(B, K2, Cin, Ho * Wo),
                       weight.reshape(Cout, Cin, K2))
    return out.view(B, Cout, Ho, Wo) + bias.view(1, -1, 1, 1)


def install_ref_dcn_shim():
    """Give the reference a working CPU DCN (its CUDA ``_ext`` cannot exist
    in this image): :func:`ref_dcn_v2_conv` wrapped in a module with the
    exact ``DCN`` interface + state-dict layout of
    ``external/DCNv2/dcn_v2.py:97-128``.  Patches ``backbone.DCN`` (the
    symbol the reference's Bottleneck closes over) and returns the class."""
    import math

    import torch
    import torch.nn as nn

    def _pair(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    dcn_v2_conv = ref_dcn_v2_conv

    class DCN(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride,
                     padding, dilation=1, deformable_groups=1):
            super().__init__()
            k = _pair(kernel_size)
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.deformable_groups = deformable_groups
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels, *k))
            self.bias = nn.Parameter(torch.empty(out_channels))
            # DCNv2.reset_parameters (dcn_v2.py:76-84)
            stdv = 1.0 / math.sqrt(in_channels * k[0] * k[1])
            self.weight.data.uniform_(-stdv, stdv)
            self.bias.data.zero_()
            self.conv_offset_mask = nn.Conv2d(
                in_channels, deformable_groups * 3 * k[0] * k[1],
                kernel_size=k, stride=_pair(stride), padding=_pair(padding),
                bias=True)
            self.conv_offset_mask.weight.data.zero_()
            self.conv_offset_mask.bias.data.zero_()

        def forward(self, x):
            out = self.conv_offset_mask(x)
            o1, o2, mask = torch.chunk(out, 3, dim=1)
            offset = torch.cat((o1, o2), dim=1)
            mask = torch.sigmoid(mask)
            return dcn_v2_conv(x, offset, mask, self.weight, self.bias,
                               self.stride, self.padding, self.dilation,
                               self.deformable_groups)

    DCN.dcn_v2_conv = staticmethod(dcn_v2_conv)  # for direct-math checks
    import backbone as ref_backbone
    ref_backbone.DCN = DCN
    return DCN


def install_ref_cython_nms_shim():
    """Let the reference's ``traditional_nms`` run without Cython: stub
    ``pyximport`` and provide ``utils.cython_nms.nms`` as a line-faithful
    numpy transcription of ``utils/cython_nms.pyx:24-74`` (+1 areas, score
    order greedy suppression at ovr >= thresh, keep indices returned in
    ORIGINAL det order via np.where)."""
    import numpy as np

    def nms(dets, thresh):
        x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
        scores = dets[:, 4]
        areas = (x2 - x1 + 1) * (y2 - y1 + 1)
        order = scores.argsort()[::-1]
        n = dets.shape[0]
        suppressed = np.zeros(n, np.bool_)
        for _i in range(n):
            i = order[_i]
            if suppressed[i]:
                continue
            for _j in range(_i + 1, n):
                j = order[_j]
                if suppressed[j]:
                    continue
                xx1 = max(x1[i], x1[j])
                yy1 = max(y1[i], y1[j])
                xx2 = min(x2[i], x2[j])
                yy2 = min(y2[i], y2[j])
                inter = max(0.0, xx2 - xx1 + 1) * max(0.0, yy2 - yy1 + 1)
                if inter / (areas[i] + areas[j] - inter) >= thresh:
                    suppressed[j] = True
        return np.where(~suppressed)[0]

    pyx = types.ModuleType('pyximport')
    pyx.install = lambda **kw: None
    sys.modules.setdefault('pyximport', pyx)
    m = types.ModuleType('utils.cython_nms')
    m.nms = nms
    sys.modules['utils.cython_nms'] = m
    return nms
