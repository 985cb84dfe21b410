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
