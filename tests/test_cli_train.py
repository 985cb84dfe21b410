import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config
from test_eval import _write_tiny_coco


def test_train_cli_smoke(tmp_path):
    """cli.train end-to-end: synthetic dataset -> a few SGD steps ->
    checkpoint on disk -> resumable."""
    from yolact_tpu.config import register_config
    from yolact_tpu.cli.train import train
    from yolact_tpu.utils.functions import SavePath

    img_dir, json_path = _write_tiny_coco(tmp_path, n_images=4, size=96)
    cfg = tiny_resnet_config()
    cfg = cfg.copy(
        name='clitest',
        max_iter=3,
        lr_warmup_until=0,
        dataset=cfg.dataset.copy(
            train_images=img_dir, train_info=json_path,
            valid_images=img_dir, valid_info=json_path,
            class_names=('thing', 'b', 'c', 'd'), label_map=None))
    register_config(cfg)

    save = str(tmp_path / 'weights')
    train(['--config', 'clitest', '--batch_size', '2', '--no_autoscale',
           '--save_folder', save, '--no_log', '--num_workers', '1',
           '--validation_epoch', '0', '--save_interval', '1000',
           '--max_gt', '8'])
    latest = SavePath.get_latest(save, 'clitest')
    assert latest is not None

    # resume from it for one more step
    cfg2 = cfg.copy(max_iter=4)
    register_config(cfg2)
    train(['--config', 'clitest', '--batch_size', '2', '--no_autoscale',
           '--save_folder', save, '--no_log', '--num_workers', '1',
           '--validation_epoch', '0', '--save_interval', '1000',
           '--max_gt', '8', '--resume', 'latest'])
    latest2 = SavePath.get_latest(save, 'clitest')
    assert SavePath.from_str(latest2).iteration >= 3


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_train_cli_spatial_split(tmp_path):
    """--spatial_split=4 trains on a 2-D (data x space) mesh."""
    from yolact_tpu.config import register_config
    from yolact_tpu.cli.train import train
    from yolact_tpu.utils.functions import SavePath

    img_dir, json_path = _write_tiny_coco(tmp_path, n_images=4, size=96)
    cfg = tiny_resnet_config()
    cfg = cfg.copy(
        name='clisp',
        max_iter=2,
        lr_warmup_until=0,
        dataset=cfg.dataset.copy(
            train_images=img_dir, train_info=json_path,
            valid_images=img_dir, valid_info=json_path,
            class_names=('thing', 'b', 'c', 'd'), label_map=None))
    register_config(cfg)
    save = str(tmp_path / 'weights')
    train(['--config', 'clisp', '--batch_size', '2', '--no_autoscale',
           '--save_folder', save, '--no_log', '--num_workers', '1',
           '--validation_epoch', '0', '--save_interval', '1000',
           '--max_gt', '8', '--spatial_split', '4'])
    assert SavePath.get_latest(save, 'clisp') is not None
