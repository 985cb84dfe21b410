import pytest

from yolact_tpu import config as C


def test_registry_names():
    names = C.config_names()
    for n in ('yolact_base', 'yolact_resnet50', 'yolact_darknet53',
              'yolact_im400', 'yolact_im700', 'yolact_resnet50_pascal',
              'yolact_plus_base', 'yolact_plus_resnet50'):
        assert n in names


def test_get_config_accepts_suffix():
    assert C.get_config('yolact_base_config') is C.get_config('yolact_base')


def test_yolact_base_fields():
    cfg = C.get_config('yolact_base')
    assert cfg.max_size == 550
    assert cfg.num_classes == 81
    assert cfg.lr_steps == (280000, 600000, 700000, 750000)
    assert cfg.max_iter == 800000
    assert cfg.mask_type == C.MaskType.LINCOMB
    assert cfg.mask_alpha == 6.125
    assert cfg.fpn.num_downsample == 2 and cfg.fpn.use_conv_downsample
    assert cfg.backbone.use_square_anchors
    assert cfg.backbone.pred_scales == ((24,), (48,), (96,), (192,), (384,))
    assert cfg.crowd_iou_threshold == 0.7
    assert cfg.use_semantic_segmentation_loss


def test_derived_mask_dim_and_heads():
    cfg = C.get_config('yolact_base')
    assert cfg.mask_dim == 32        # last proto layer is (32, 1) conv
    assert cfg.num_heads == 5        # 3 selected + 2 fpn downsample
    direct = cfg.copy(mask_type=C.MaskType.DIRECT, mask_size=16)
    assert direct.mask_dim == 256


def test_im700_scales():
    cfg = C.get_config('yolact_im700')
    assert cfg.max_size == 700
    assert cfg.masks_to_train == 300
    # int(24/550*700) = 30, etc (reference data/config.py:715-723)
    assert cfg.backbone.pred_scales == ((30,), (61,), (122,), (244,), (488,))


def test_plus_configs():
    cfg = C.get_config('yolact_plus_resnet50')
    assert cfg.use_maskiou and cfg.rescore_mask and not cfg.rescore_bbox
    assert cfg.discard_mask_area == 25
    assert not cfg.backbone.use_square_anchors
    assert len(cfg.backbone.pred_scales[0]) == 3
    assert cfg.backbone.args == ((3, 4, 6, 3), (0, 4, 6, 3))
    base = C.get_config('yolact_plus_base')
    assert base.backbone.args == ((3, 4, 23, 3), (0, 4, 23, 3), 3)
    assert base.maskiou_alpha == 25


def test_config_is_hashable_and_frozen():
    cfg = C.get_config('yolact_base')
    hash(cfg)
    with pytest.raises(Exception):
        cfg.max_size = 600


def test_config_from_model_path():
    cfg = C.config_from_model_path('weights/yolact_base_54_800000.pth')
    assert cfg.name == 'yolact_base'
    cfg = C.config_from_model_path('/x/yolact_plus_resnet50_0_10_interrupt.pth')
    assert cfg.name == 'yolact_plus_resnet50'


def test_backbone_channels():
    assert C.backbone_channels(C.get_config('yolact_base').backbone) == \
        (256, 512, 1024, 2048)
    assert C.backbone_channels(C.get_config('yolact_darknet53').backbone) == \
        (64, 128, 256, 512, 1024)
