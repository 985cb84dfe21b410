"""Small configs for fast CPU tests."""

from yolact_tpu import config as C


def tiny_resnet_config(**kw):
    """yolact_base topology with a tiny ResNet and 128px input."""
    cfg = C.get_config('yolact_base')
    return cfg.copy(
        max_size=128,
        num_classes=5,
        dataset=cfg.dataset.copy(class_names=('a', 'b', 'c', 'd')),
        backbone=cfg.backbone.copy(
            args=((1, 1, 1, 1),),
            pred_scales=((6,), (12,), (24,), (48,), (96,))),
        mask_proto_net=((8, 3, (('padding', 1),)),
                        (None, -2, ()),
                        (8, 1, ())),
        extra_head_net=((16, 3, (('padding', 1),)),),
        fpn=cfg.fpn.copy(num_features=16),
        **kw)


def tiny_plus_config(**kw):
    """yolact_plus_resnet50 topology (DCN stages 2-4, maskiou, rescore_mask)
    with a tiny ResNet and 128px input.  Mirror of the reference-side tiny
    plus cfg in test_full_eval_oracle.py."""
    cfg = C.get_config('yolact_plus_resnet50')
    return cfg.copy(
        max_size=128,
        num_classes=5,
        dataset=cfg.dataset.copy(class_names=('a', 'b', 'c', 'd')),
        backbone=cfg.backbone.copy(
            args=((1, 1, 1, 1), (0, 1, 1, 1)),
            pred_scales=((6,), (12,), (24,), (48,), (96,))),
        mask_proto_net=((8, 3, (('padding', 1),)),
                        (None, -2, ()),
                        (8, 1, ())),
        extra_head_net=((16, 3, (('padding', 1),)),),
        fpn=cfg.fpn.copy(num_features=16),
        maskiou_net=((8, 3, (('stride', 2),)), (16, 3, (('stride', 2),)),
                     (32, 3, (('stride', 2),))),
        **kw)


def tiny_darknet_config(**kw):
    cfg = C.get_config('yolact_darknet53')
    return cfg.copy(
        max_size=128,
        num_classes=5,
        backbone=cfg.backbone.copy(
            args=((1, 1, 1, 1, 1),),
            pred_scales=((6,), (12,), (24,), (48,), (96,))),
        mask_proto_net=((8, 3, (('padding', 1),)),
                        (None, -2, ()),
                        (8, 1, ())),
        extra_head_net=((16, 3, (('padding', 1),)),),
        fpn=cfg.fpn.copy(num_features=16),
        **kw)
