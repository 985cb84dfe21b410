"""AOT export (convert/export.py): roundtrip + exactness vs live pipeline."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config


def test_export_roundtrip_matches_pipeline(tmp_path, rng):
    from yolact_tpu.convert.export import export_inference, load_exported
    from yolact_tpu.infer import Pipeline, random_variables

    cfg = tiny_resnet_config()
    variables = random_variables(cfg)
    path = str(tmp_path / 'tiny.ystablehlo')
    export_inference(cfg, variables, path, batch_size=2)
    assert os.path.getsize(path) > 0

    runner = load_exported(path)
    assert runner.meta['config'] == cfg.name
    assert runner.meta['batch'] == 2
    assert runner.meta['fields'][:3] == ['boxes', 'classes', 'scores']

    images = (rng.rand(2, cfg.max_size, cfg.max_size, 3) * 255) \
        .astype(np.float32)
    out = runner(images)
    live = Pipeline(cfg, variables)(images)

    live_fields = [live.boxes, live.classes, live.scores, live.masks,
                   live.valid]
    assert len(out) == len(live_fields)
    for got, want, name in zip(out, live_fields, runner.meta['fields']):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=name)


def test_export_cli(tmp_path, rng):
    from yolact_tpu.config import register_config
    from yolact_tpu.infer import random_variables
    from yolact_tpu.train.checkpoint import save_weights_only
    from yolact_tpu.cli import export as export_cli

    cfg = tiny_resnet_config().copy(name='tinyexport')
    register_config(cfg)
    ckpt = str(tmp_path / 'tinyexport_0_1.ckpt')
    save_weights_only(random_variables(cfg), ckpt)
    out = str(tmp_path / 'tinyexport.ystablehlo')
    export_cli.main(['--trained_model=' + ckpt, '--out=' + out,
                     '--selftest'])
    assert os.path.exists(out)
