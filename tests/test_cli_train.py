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


def test_train_cli_spatial_split(tmp_path):
    """--spatial_split=4 trains on a 2-D (data x space) mesh.

    Runs in a SUBPROCESS: in a full pytest process (torch co-loaded, many
    collected modules, 8-way SPMD on few cores) the XLA:CPU runtime has
    been observed aborting inside a device-to-host fetch — a
    load-dependent runtime flake, not a numerics problem (the same
    program passes standalone 3/3, and test_parallel verifies the
    spatial-split step loss-identical to single-device).
    """
    import subprocess

    img_dir, json_path = _write_tiny_coco(tmp_path, n_images=4, size=96)
    save = str(tmp_path / 'weights')
    script = tmp_path / 'run_sp.py'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(f"""
import os, sys
# strip any inherited device-count flag (e.g. conftest's) before forcing
# this process's own 8-device CPU platform
flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
         if not f.startswith('--xla_force_host_platform_device_count')]
os.environ['XLA_FLAGS'] = ' '.join(
    flags + ['--xla_force_host_platform_device_count=8'])
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + '/tests')
from _tiny import tiny_resnet_config
from yolact_tpu.config import register_config
from yolact_tpu.cli.train import train
cfg = tiny_resnet_config()
cfg = cfg.copy(name='clisp', max_iter=2, lr_warmup_until=0,
               dataset=cfg.dataset.copy(
                   train_images={img_dir!r}, train_info={json_path!r},
                   valid_images={img_dir!r}, valid_info={json_path!r},
                   class_names=('thing', 'b', 'c', 'd'), label_map=None))
register_config(cfg)
train(['--config', 'clisp', '--batch_size', '2', '--no_autoscale',
       '--save_folder', {save!r}, '--no_log', '--num_workers', '1',
       '--validation_epoch', '0', '--save_interval', '1000',
       '--max_gt', '8', '--spatial_split', '4'])
""")
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    proc = subprocess.run([sys.executable, str(script)], env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    from yolact_tpu.utils.functions import SavePath
    assert SavePath.get_latest(save, 'clisp') is not None
