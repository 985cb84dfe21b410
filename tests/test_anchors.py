import numpy as np

from yolact_tpu import config as C
from yolact_tpu.ops import anchors as A


def test_feature_sizes_yolact_base():
    cfg = C.get_config('yolact_base')
    sizes = A.feature_map_sizes(cfg)
    assert sizes == ((69, 69), (35, 35), (18, 18), (9, 9), (5, 5))


def test_feature_sizes_darknet():
    cfg = C.get_config('yolact_darknet53')
    assert A.feature_map_sizes(cfg) == ((69, 69), (35, 35), (18, 18), (9, 9), (5, 5))


def test_feature_sizes_im700():
    cfg = C.get_config('yolact_im700')
    sizes = A.feature_map_sizes(cfg)
    # 700 -> conv1 350 -> pool 175 -> 175, 88, 44, 22 -> fpn 11, 6
    assert sizes == ((88, 88), (44, 44), (22, 22), (11, 11), (6, 6))


def test_num_priors_yolact_base():
    cfg = C.get_config('yolact_base')
    # 3 * (69^2 + 35^2 + 18^2 + 9^2 + 5^2) = 19248 (SURVEY.md §3.4)
    assert A.num_priors(cfg) == 19248


def test_priors_match_reference_algorithm():
    """The vectorised generator must equal the loop transliteration."""
    for name in ('yolact_base', 'yolact_plus_resnet50', 'yolact_resnet50_pascal'):
        cfg = C.get_config(name)
        sizes = A.feature_map_sizes(cfg)
        for idx, (h, w) in enumerate(sizes):
            slow = A._level_priors(h, w, cfg.backbone.pred_aspect_ratios[idx],
                                   cfg.backbone.pred_scales[idx], cfg)
            fast = A._fast_level_priors(h, w, cfg.backbone.pred_aspect_ratios[idx],
                                        cfg.backbone.pred_scales[idx], cfg)
            np.testing.assert_allclose(slow, fast, rtol=0, atol=0)


def test_priors_values_spotcheck():
    cfg = C.get_config('yolact_base')
    pr = A.generate_priors(cfg)
    # First prior: pixel (0,0) of the 69x69 map, ar=1, scale=24
    np.testing.assert_allclose(pr[0], [0.5 / 69, 0.5 / 69, 24 / 550, 24 / 550],
                               rtol=1e-6)
    # Square-anchor bug: h == w for every prior in this config
    np.testing.assert_allclose(pr[:, 2], pr[:, 3])
    # Second prior at same pixel: ar=1/2 -> w = 24*sqrt(0.5)/550
    np.testing.assert_allclose(pr[1, 2], 24 * np.sqrt(0.5) / 550, rtol=1e-6)


def test_priors_plus_no_square():
    cfg = C.get_config('yolact_plus_base')
    pr = A.generate_priors(cfg)
    assert pr.shape == (3 * 3 * (69**2 + 35**2 + 18**2 + 9**2 + 5**2), 4)
    assert not np.allclose(pr[:, 2], pr[:, 3])


def test_fast_level_priors_matches_reference_loop():
    """_fast_level_priors claims identical output to the loop-form
    _level_priors (the executable spec) — enforce it so the pair can't
    silently desynchronize."""
    from yolact_tpu.config import get_config
    from yolact_tpu.ops import anchors as A

    for name in ('yolact_base', 'yolact_plus_resnet50', 'yolact_vgg16'):
        cfg = get_config(name)
        for i, _ in enumerate(cfg.backbone.pred_scales):
            ars = cfg.backbone.pred_aspect_ratios[i]
            scales = cfg.backbone.pred_scales[i]
            for size in (9, 18):
                slow = A._level_priors(size, size, ars, scales, cfg)
                fast = A._fast_level_priors(size, size, ars, scales, cfg)
                np.testing.assert_array_equal(slow, fast, err_msg=name)


def test_proto_seg_size_match_model():
    """The static proto/seg output-size helpers (used to precompute gt mask
    targets on the host) must match the real model's shapes."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax
    import jax.numpy as jnp
    from _tiny import tiny_resnet_config
    from yolact_tpu.models.yolact import Yolact
    from yolact_tpu.ops.anchors import proto_size, seg_size

    cfg = tiny_resnet_config()
    assert cfg.use_semantic_segmentation_loss
    model = Yolact(cfg)
    x = jnp.zeros((1, cfg.max_size, cfg.max_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    preds, _ = model.apply(variables, x, train=True,
                           mutable=['batch_stats'])
    assert tuple(preds['proto'].shape[1:3]) == proto_size(cfg)
    assert tuple(preds['segm'].shape[1:3]) == seg_size(cfg)
