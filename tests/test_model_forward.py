import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolact_tpu.models.yolact import Yolact
from yolact_tpu.ops.anchors import feature_map_sizes, num_priors

from _tiny import tiny_resnet_config, tiny_darknet_config


def _forward(cfg, train=False, seed=0):
    model = Yolact(cfg)
    x = jnp.asarray(np.random.RandomState(seed).rand(1, cfg.max_size,
                                                     cfg.max_size, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=train)
    if train:
        out, _ = model.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    else:
        out = model.apply(variables, x, train=False)
    return cfg, out


def test_tiny_resnet_shapes():
    cfg, out = _forward(tiny_resnet_config())
    P = num_priors(cfg)
    assert out['loc'].shape == (1, P, 4)
    assert out['conf'].shape == (1, P, cfg.num_classes)
    assert out['mask'].shape == (1, P, cfg.mask_dim)
    assert out['priors'].shape == (P, 4)
    # proto: src level P3 upsampled x2 by the interp layer in the spec
    p3 = feature_map_sizes(cfg)[0]
    assert out['proto'].shape == (1, 2 * p3[0], 2 * p3[1], cfg.mask_dim)
    # coefficients are tanh-bounded
    assert float(jnp.abs(out['mask']).max()) <= 1.0
    assert float(out['proto'].min()) >= 0.0  # relu


def test_tiny_resnet_train_branch():
    cfg, out = _forward(tiny_resnet_config(), train=True)
    sizes = feature_map_sizes(cfg)
    assert out['segm'].shape == (1, sizes[0][0], sizes[0][1],
                                 cfg.num_classes - 1)


def test_tiny_darknet_shapes():
    cfg, out = _forward(tiny_darknet_config())
    P = num_priors(cfg)
    assert out['loc'].shape == (1, P, 4)


def test_feature_sizes_match_model():
    cfg = tiny_resnet_config()
    _, out = _forward(cfg)
    P_expected = sum(h * w * 3 for h, w in feature_map_sizes(cfg))
    assert out['loc'].shape[1] == P_expected


def test_shared_head_params_shared():
    cfg = tiny_resnet_config()
    model = Yolact(cfg)
    x = jnp.zeros((1, cfg.max_size, cfg.max_size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables['params']
    assert 'prediction_layers_0' in params
    assert 'prediction_layers_1' not in params  # shared

    nonshared = cfg.copy(share_prediction_module=False)
    v2 = Yolact(nonshared).init(jax.random.PRNGKey(0), x)
    assert 'prediction_layers_1' in v2['params']


def test_nonsquare_forward_preserve_ar():
    """preserve_aspect_ratio path: non-square input, priors track (h, w)."""
    cfg = tiny_resnet_config(preserve_aspect_ratio=True)
    model = Yolact(cfg)
    x = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    sizes = feature_map_sizes(cfg, (96, 128))
    P = sum(h * w * 3 for h, w in sizes)
    assert out['loc'].shape == (1, P, 4)
    assert out['priors'].shape == (P, 4)


def test_use_prediction_module():
    """DSSD (c) prediction module variant builds and runs."""
    cfg = tiny_resnet_config(use_prediction_module=True)
    model = Yolact(cfg)
    x = jnp.zeros((1, cfg.max_size, cfg.max_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert 'block' in variables['params']['prediction_layers_0']
    out = model.apply(variables, x)
    assert np.isfinite(np.asarray(out['loc'])).all()


def test_stem_s2d_matches_plain(rng):
    """The space-to-depth stem (cfg.stem_s2d + preprocess_device_s2d) must
    reproduce the plain pipeline exactly: same taps, same params, only the
    data layout differs (models/layers.py:s2d_stem_kernel)."""
    import jax
    from _tiny import tiny_resnet_config
    from yolact_tpu.infer import forward_and_detect, random_variables
    from yolact_tpu.models.yolact import Yolact

    cfg = tiny_resnet_config()
    variables = random_variables(cfg)
    imgs = (rng.rand(2, 96, 120, 3) * 255).astype(np.float32)  # raw BGR

    out1 = jax.jit(lambda v, x: forward_and_detect(cfg, Yolact(cfg), v, x)
                   )(variables, imgs)

    cfg2 = cfg.copy(stem_s2d=True)
    out2 = jax.jit(lambda v, x: forward_and_detect(cfg2, Yolact(cfg2), v, x)
                   )(variables, imgs)

    np.testing.assert_array_equal(np.asarray(out1.classes),
                                  np.asarray(out2.classes))
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out2.scores), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1.boxes),
                               np.asarray(out2.boxes), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1.masks),
                               np.asarray(out2.masks), atol=2e-4)


def test_stem_s2d_rejected_for_non_resnet():
    from _tiny import tiny_darknet_config
    from yolact_tpu.models.yolact import Yolact
    import jax.numpy as jnp
    import jax
    import pytest as _pytest
    cfg = tiny_darknet_config().copy(stem_s2d=True)
    with _pytest.raises(ValueError):
        Yolact(cfg).init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 12)), train=False)


def test_vgg16_named_config_pipeline():
    """The named yolact_vgg16 config (SSD arrangement, no FPN, per-level
    heads) runs end-to-end through Pipeline.  Reduced resolution for CPU
    speed; 300 keeps all six SSD levels non-degenerate (38/19/10/5/3/1)."""
    from yolact_tpu.config import get_config
    from yolact_tpu.infer import Pipeline, random_variables

    cfg = get_config('yolact_vgg16').copy(max_size=300)
    assert cfg.num_heads == 6
    assert cfg.proto_in_channels == 512   # stride-8 VGG stage feeds protonet
    variables = random_variables(cfg)
    pipe = Pipeline(cfg, variables)
    out = pipe(np.random.RandomState(0).randint(
        0, 256, (1, 300, 300, 3)).astype(np.float32))
    assert out.boxes.shape == (1, cfg.max_num_detections, 4)
    assert np.all(np.isfinite(np.asarray(out.boxes)))
    assert np.all(np.isfinite(np.asarray(out.scores)))


def test_preprocess_device_channel_orders():
    """Device preprocess reproduces BackboneTransform for every channel
    order (augmentations.py:566-596): normalize in BGR space, permute
    after.  The reference's own FastBaseTransform raises for non-RGB
    (augmentations.py:652-653); this path serves BGR-trained weights too."""
    from yolact_tpu.config import MEANS, STD, TransformConfig, get_config
    from yolact_tpu.infer import preprocess_device

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.float32)  # BGR
    base = get_config('yolact_base').copy(max_size=32)
    for order in ('RGB', 'BGR', 'GRB'):
        for mode in ('normalize', 'subtract_means', 'to_float'):
            t = TransformConfig(channel_order=order,
                                normalize=mode == 'normalize',
                                subtract_means=mode == 'subtract_means',
                                to_float=mode == 'to_float')
            cfg = base.copy(backbone=base.backbone.copy(transform=t))
            got = np.asarray(preprocess_device(cfg, jnp.asarray(img)))
            ref = img.copy()
            if t.normalize:
                ref = (ref - np.array(MEANS, np.float32)) / \
                    np.array(STD, np.float32)
            elif t.subtract_means:
                ref = ref - np.array(MEANS, np.float32)
            elif t.to_float:
                ref = ref / 255.0
            ref = ref[..., ['BGR'.index(c) for c in order]]
            np.testing.assert_allclose(got, ref, atol=1e-5,
                                       err_msg=f'{order}/{mode}')


def test_mask_proto_use_grid_forward(tmp_path):
    """A ``mask_proto_use_grid`` config builds and runs: the grid file's
    planes are concatenated to the proto-net input as extra channels
    (yolact.py:411-413,584-586).  The repo ships ``data/grid.npy``
    (32x35x35, mirroring the reference asset) for the 35x35-convout
    grid-prior configs; tiny configs need a grid matching their own P3
    size, generated here via scripts/make_grid.py."""
    import os
    import subprocess
    import sys

    from yolact_tpu.ops.anchors import feature_map_sizes

    cfg = tiny_resnet_config()
    p3 = feature_map_sizes(cfg)[0]
    grid_file = str(tmp_path / 'grid.npy')
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, 'scripts/make_grid.py'),
         '--size', f'{p3[0]},{p3[1]}', '--random', '4', '--seed', '0',
         '--out', grid_file], check=True, cwd=repo)
    cfg = cfg.copy(mask_proto_use_grid=True, mask_proto_grid_file=grid_file)
    _, out = _forward(cfg)
    assert out['proto'].shape[-1] == cfg.mask_dim
    assert np.all(np.isfinite(np.asarray(out['proto'])))

    # wrong-sized grid fails with an actionable error, not a cryptic
    # concat shape mismatch
    bad = str(tmp_path / 'bad.npy')
    np.save(bad, np.zeros((2, 3, 3), np.float32))
    with pytest.raises(ValueError, match='make_grid'):
        _forward(cfg.copy(mask_proto_grid_file=bad))


def test_shipped_grid_asset_resolves_from_any_cwd(tmp_path, monkeypatch):
    """The default ``data/grid.npy`` (relative path in the config) is
    shipped and resolves against the repo root when CWD is elsewhere."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    g = np.load(os.path.join(repo, 'data/grid.npy'))
    assert g.shape == (32, 35, 35)  # reference asset shape

    monkeypatch.chdir(tmp_path)
    from yolact_tpu.config import get_config
    cfg = get_config('yolact_base').copy(mask_proto_use_grid=True)
    # 550^2 base config: P3 convout is 69x69 != 35 -> the loader must get
    # far enough to read the file (proving path resolution) and then fail
    # on the documented size check
    with pytest.raises(ValueError, match='make_grid'):
        _forward(cfg)
