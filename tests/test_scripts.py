"""End-to-end exercises of the scripts/ toolbox (SURVEY §2.7 #36/#37)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_eval import _write_tiny_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=240, **kw)


@pytest.fixture(scope='module')
def bbox_dump(tmp_path_factory):
    """Reference-format gt dump ([im_w, im_h, x, y, w, h] pickle)."""
    tmp = tmp_path_factory.mktemp('scripts')
    _, json_path = _write_tiny_coco(tmp, n_images=4, size=96)
    out = str(tmp / 'bboxes.pkl')
    r = run(['scripts/save_bboxes.py', json_path, out])
    assert r.returncode == 0, r.stderr
    from scripts._bbox_io import load_abs_dump
    rows = load_abs_dump(out)
    assert rows.shape[1] == 6 and (rows[:, 0] == 96).all()
    return out


@pytest.fixture(scope='module')
def aug_dump(bbox_dump):
    out = bbox_dump.replace('bboxes.pkl', 'bboxes_aug.pkl')
    r = run(['scripts/augment_bbox.py', bbox_dump, out,
             '--seed', '0', '--stats'])
    assert r.returncode == 0, r.stderr
    assert 'augmented' in r.stdout
    from scripts._bbox_io import load_rel_dump
    aug = load_rel_dump(out)
    # crop clamps into the sampled rect; percent coords stay near [0, 1]
    # (the reference's int-truncated rect corners vs float crop size can
    # overshoot by <1px, preserved here)
    assert aug.shape[1] == 4
    assert (aug >= -1e-9).all() and (aug <= 1.05).all()
    assert (aug[:, 2:] >= aug[:, :2]).all()
    return out


def test_augment_bbox_deterministic(bbox_dump, tmp_path):
    a = str(tmp_path / 'a.npy')
    b = str(tmp_path / 'b.npy')
    for out in (a, b):
        r = run(['scripts/augment_bbox.py', bbox_dump, out, '--seed', '7'])
        assert r.returncode == 0, r.stderr
    np.testing.assert_array_equal(np.load(a), np.load(b))


def test_save_and_cluster(bbox_dump):
    r = run(['scripts/cluster_bbox_sizes.py', bbox_dump,
             '--scale-clusters', '3', '--ar-clusters', '2'])
    assert r.returncode == 0, r.stderr
    assert r.stdout.count('aspect ratios:') == 3


def test_bbox_recall_config(bbox_dump):
    r = run(['scripts/bbox_recall.py', bbox_dump,
             '--config', 'yolact_base', '--thresh', '0.5'])
    assert r.returncode == 0, r.stderr
    assert 'Total recall:' in r.stdout
    for b in ('small', 'medium', 'large'):
        assert f'{b} recall:' in r.stdout


def test_bbox_recall_spec_and_aug(bbox_dump, aug_dump):
    r = run(['scripts/bbox_recall.py', bbox_dump, '--aug', aug_dump])
    assert r.returncode == 0, r.stderr
    assert 'Total recall:' in r.stdout


def test_optimize_bboxes_designer(aug_dump):
    r = run(['scripts/optimize_bboxes.py', aug_dump, '--iters', '2',
             '--batch-size', '64'])
    assert r.returncode == 0, r.stderr
    assert 'scales = [' in r.stdout
    assert 'aspect_ratios = [' in r.stdout
    # both alternation phases ran
    assert 'optimised aspect ratios' in r.stdout
    assert 'optimised scales' in r.stdout


def test_optimize_bboxes_config_mode(aug_dump):
    r = run(['scripts/optimize_bboxes.py', aug_dump,
             '--config', 'yolact_base'])
    assert r.returncode == 0, r.stderr
    assert 'optimized mean best IoU' in r.stdout
    assert 'pred_scales =' in r.stdout


def test_make_grid_random_and_explicit(tmp_path):
    out = str(tmp_path / 'grid.npy')
    r = run(['scripts/make_grid.py', '--size', '12,12', '--random', '3',
             '--grid', '0.5,0.5,4,0,0', '--basis', '--seed', '1',
             '--out', out])
    assert r.returncode == 0, r.stderr
    g = np.load(out)
    assert g.shape == (3 + 1 + 12, 12, 12)
    # lattice grids (random + explicit) are clipped to [0,1]; the basis
    # grids that follow are coordinate features and legitimately span
    # [-1, 1] / [0, sqrt(2)]
    lattices = g[:4]
    assert (lattices >= 0).all() and (lattices <= 1 + 1e-6).all()
    assert 'Saved 16 grids' in r.stdout


def test_make_grid_uniqueness():
    from scripts.make_grid import basis_grids, render_lattice, test_uniqueness
    g = np.stack(basis_grids(12, 12))
    assert test_uniqueness(g, quiet=True)
    # a single constant-ish grid cannot separate pixels
    flat = np.zeros((1, 12, 12))
    assert not test_uniqueness(flat, quiet=True)
    lat = render_lattice(12, 12, 0.3, 0.7, scale=2.5, angle=0.9,
                         spacing=0.4)
    assert lat.shape == (12, 12)
    assert lat.min() >= 0 and lat.max() <= 1


def test_plot_loss(tmp_path):
    from yolact_tpu.utils.logger import Log
    log = Log('scripttest', str(tmp_path))
    for i in range(5):
        log.log('train', loss={'B': 1.0 / (i + 1), 'C': 2.0}, lr=1e-3,
                epoch=0, iter=i * 10)
    out = str(tmp_path / 'plot.png')
    r = run(['scripts/plot_loss.py', str(tmp_path / 'scripttest.log'), out])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)


def test_parse_eval(tmp_path):
    from yolact_tpu.eval.evaluator import print_maps
    import io
    from contextlib import redirect_stdout
    from collections import OrderedDict
    maps = {'box': OrderedDict([('all', 31.2), (50, 50.1), (55, 48.0)]),
            'mask': OrderedDict([('all', 29.9), (50, 47.5), (55, 45.0)])}
    buf = io.StringIO()
    with redirect_stdout(buf):
        print_maps(maps)
    path = tmp_path / 'eval.txt'
    path.write_text(buf.getvalue())
    r = run(['scripts/parse_eval.py', str(path)])
    assert r.returncode == 0, r.stderr
    assert 'box,' in r.stdout and 'mask,' in r.stdout


def test_compute_masks(tmp_path, rng):
    np.save(tmp_path / 'proto.npy', rng.rand(16, 16, 4).astype(np.float32))
    np.save(tmp_path / 'gt.npy', (rng.rand(2, 32, 32) > 0.5).astype(np.float32))
    r = run(['scripts/compute_masks.py', str(tmp_path / 'proto.npy'),
             str(tmp_path / 'gt.npy'), str(tmp_path / 'vis')])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(str(tmp_path / 'vis_protos.png'))


def test_unpack_statedict(tmp_path):
    from yolact_tpu.train.checkpoint import save_weights_only
    save_weights_only({'params': {'a': np.ones((2, 2), np.float32)}},
                      str(tmp_path / 'w_0_1.ckpt'))
    r = run(['scripts/unpack_statedict.py', str(tmp_path / 'w_0_1.ckpt'),
             str(tmp_path / 'unpacked')])
    assert r.returncode == 0, r.stderr
    assert os.listdir(str(tmp_path / 'unpacked'))


def test_mix_sets(tmp_path):
    (tmp_path / 'a').mkdir()
    _, j1 = _write_tiny_coco(tmp_path / 'a', n_images=2, size=64)
    out = str(tmp_path / 'merged.json')
    r = run(['data/scripts/mix_sets.py', out, j1, j1])
    assert r.returncode == 0, r.stderr
    d = json.loads(open(out).read())
    assert len(d['images']) == 2  # dedup by image id
    assert len(d['annotations']) == 8  # anns concatenated with new ids


def test_convert_darknet_binary(tmp_path):
    # synthesize a .weights blob with the right element count
    from scripts.convert_darknet import conv_names
    n = 5
    total = 0
    for _, out_ch, in_ch, k in conv_names():
        total += 4 * out_ch + out_ch * in_ch * k * k
    blob = np.concatenate([np.zeros(5, np.int32).view(np.float32)
                           if False else np.zeros(5, np.float32),
                           np.random.rand(total).astype(np.float32)])
    path = tmp_path / 'darknet53.weights'
    with open(path, 'wb') as f:
        np.zeros(5, np.int32).tofile(f)
        np.random.rand(total).astype(np.float32).tofile(f)
    out = str(tmp_path / 'darknet53.pth')
    r = run(['scripts/convert_darknet.py', str(path), out])
    assert r.returncode == 0, r.stderr
    import torch
    sd = torch.load(out, weights_only=False)
    assert '_preconv.0.weight' in sd


def test_flops_accounting():
    """scripts/flops.py: lowered-HLO FLOPs for a registered config, and
    the MFU arithmetic."""
    sys.path.insert(0, REPO)
    from _tiny import tiny_resnet_config
    from scripts.flops import forward_flops
    from yolact_tpu.config import register_config

    register_config(tiny_resnet_config().copy(name='tiny_flops_probe'))
    row = forward_flops('tiny_flops_probe')
    assert row['flops_per_image_g'] > 0.5          # ~0.95 GF at 128px
    assert row['params_m'] > 0.1
    tr = forward_flops('tiny_flops_probe', batch=2, train=True)
    assert tr['flops_per_image_g'] >= row['flops_per_image_g']


def test_convert_darknet_h5_roundtrip(tmp_path, monkeypatch):
    """The keras-h5 path maps conv2d_%d / batch_normalization_%d groups to
    our torch prefixes in lexicographic order with HWIO->OIHW kernels
    (reference scripts/convert_darknet.py semantics)."""
    h5py = pytest.importorskip('h5py')
    import scripts.convert_darknet as cd

    # shrink the architecture so the synthetic h5 stays tiny
    monkeypatch.setattr(cd, 'LAYERS', (1, 1))
    monkeypatch.setattr(cd, 'CHANNELS', (4, 8))

    rng = np.random.RandomState(0)
    prefixes = sorted(p for p, _, _, _ in cd.conv_names())
    specs = {p: (o, i, k) for p, o, i, k in cd.conv_names()}
    want = {}
    path = tmp_path / 'darknet.h5'
    with h5py.File(path, 'w') as f:
        m = f.create_group('model_weights')
        for idx, prefix in enumerate(prefixes, 1):
            out_ch, in_ch, k = specs[prefix]
            w_oihw = rng.rand(out_ch, in_ch, k, k).astype(np.float32)
            g = m.create_group(f'conv2d_{idx}').create_group(
                f'conv2d_{idx}')
            g.create_dataset('kernel:0',
                             data=w_oihw.transpose(2, 3, 1, 0))  # HWIO
            b = m.create_group(f'batch_normalization_{idx}').create_group(
                f'batch_normalization_{idx}')
            vals = {}
            for name, key in (('beta:0', 'bias'), ('gamma:0', 'weight'),
                              ('moving_mean:0', 'running_mean'),
                              ('moving_variance:0', 'running_var')):
                v = rng.rand(out_ch).astype(np.float32)
                b.create_dataset(name, data=v)
                vals[key] = v
            want[f'{prefix}.0.weight'] = w_oihw
            for key, v in vals.items():
                want[f'{prefix}.1.{key}'] = v

    sd = cd.load_h5(str(path))
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_allclose(sd[k], want[k], err_msg=k)


def test_convert_darknet_rejects_trailing_weights(tmp_path):
    """A yolov3.weights (backbone + heads) must be refused, not silently
    truncated into a 'converted' darknet53."""
    from scripts.convert_darknet import conv_names, load_weights_binary
    total = sum(4 * o + o * i * k * k for _, o, i, k in conv_names())
    path = tmp_path / 'yolov3.weights'
    with open(path, 'wb') as f:
        np.zeros(5, np.int32).tofile(f)
        np.random.rand(total + 1000).astype(np.float32).tofile(f)
    with pytest.raises(ValueError, match='trailing'):
        load_weights_binary(str(path))
