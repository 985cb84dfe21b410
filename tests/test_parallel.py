"""Data-parallel correctness on the 8-device virtual CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config
from test_train import make_batch


@pytest.mark.skipif(jax.device_count() < 4, reason='needs >= 4 devices')
def test_sharded_train_step_matches_single_device(rng):
    """A batch-sharded step over the mesh must produce the same losses and
    parameter update as the same batch on one device (the all-reduce that
    XLA inserts must reconstruct the global sums exactly)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from yolact_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = tiny_resnet_config(freeze_bn=True)  # keep BN out of the equation
    model, state0 = create_train_state(cfg, seed=0)
    batch = make_batch(rng, cfg, B=4)
    key = jax.random.PRNGKey(7)

    # single device
    s1, losses1 = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))(
        state0, batch, key)

    # 4-device mesh, batch sharded
    mesh = make_mesh(jax.devices()[:4])
    state_m = jax.device_put(state0, replicate(mesh))
    batch_m = shard_batch(mesh, batch)
    s2, losses2 = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))(
        state_m, batch_m, key)

    for k in losses1:
        np.testing.assert_allclose(float(losses1[k]), float(losses2[k]),
                                   rtol=2e-4, err_msg=k)
    w1 = np.asarray(s1.params['model']['backbone']['conv1']['conv']['kernel'])
    w2 = np.asarray(s2.params['model']['backbone']['conv1']['conv']['kernel'])
    np.testing.assert_allclose(w1, w2, atol=2e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_inference_batch_sharded(rng):
    """Batched inference with the batch sharded across the mesh matches the
    replicated result."""
    from yolact_tpu.infer import forward_and_detect, random_variables
    from yolact_tpu.models.yolact import Yolact
    from yolact_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = tiny_resnet_config()
    model = Yolact(cfg)
    variables = random_variables(cfg)
    imgs = rng.rand(8, cfg.max_size, cfg.max_size, 3).astype(np.float32)

    fn = jax.jit(lambda v, x: forward_and_detect(cfg, model, v, x,
                                                 preprocess=False))
    out1 = fn(variables, imgs)

    mesh = make_mesh()
    imgs_sharded = shard_batch(mesh, imgs)
    out2 = fn(variables, imgs_sharded)
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out2.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1.classes),
                                  np.asarray(out2.classes))


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_spatial_sharded_train_step_matches_single_device(rng):
    """2-D (data x space) mesh: image height sharded across 'space' (XLA
    inserts conv halo exchanges), batch across 'data'.  Loss and update
    must match the single-device step."""
    from yolact_tpu.parallel.mesh import (make_mesh_2d, replicate,
                                          shard_batch_spatial)
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = tiny_resnet_config(freeze_bn=True)
    model, state0 = create_train_state(cfg, seed=0)
    batch = make_batch(rng, cfg, B=4)
    key = jax.random.PRNGKey(7)

    s1, losses1 = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))(
        state0, batch, key)

    mesh = make_mesh_2d(jax.devices()[:8], data=2, space=4)
    state_m = jax.device_put(state0, replicate(mesh))
    batch_m = shard_batch_spatial(mesh, batch)
    s2, losses2 = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))(
        state_m, batch_m, key)

    for k in losses1:
        np.testing.assert_allclose(float(losses1[k]), float(losses2[k]),
                                   rtol=2e-4, err_msg=k)
    w1 = np.asarray(s1.params['model']['backbone']['conv1']['conv']['kernel'])
    w2 = np.asarray(s2.params['model']['backbone']['conv1']['conv']['kernel'])
    np.testing.assert_allclose(w1, w2, atol=2e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_spatial_sharded_inference_matches(rng):
    """Inference with images height-sharded across 'space'."""
    from yolact_tpu.infer import forward_and_detect, random_variables
    from yolact_tpu.models.yolact import Yolact
    from yolact_tpu.parallel.mesh import make_mesh_2d, shard_batch_spatial

    cfg = tiny_resnet_config()
    model = Yolact(cfg)
    variables = random_variables(cfg)
    imgs = rng.rand(2, cfg.max_size, cfg.max_size, 3).astype(np.float32)

    fn = jax.jit(lambda v, x: forward_and_detect(cfg, model, v, x,
                                                 preprocess=False))
    out1 = fn(variables, imgs)
    mesh = make_mesh_2d(jax.devices(), data=2, space=4)
    out2 = fn(variables, shard_batch_spatial(mesh, imgs))
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out2.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1.classes),
                                  np.asarray(out2.classes))
