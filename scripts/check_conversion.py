"""Full-size checkpoint-conversion parity check against the reference.

Builds the reference PyTorch model at FULL size with random weights, runs
our converter on its state_dict, and compares forward outputs numerically.
This is the offline proxy for published-.pth parity (no weights in this
image).  DCN configs (yolact_plus_*) cannot be built by the reference
without its compiled CUDA extension, so they are excluded here; the DCN
layer itself is covered by tests/test_dcn.py.

Usage: python scripts/check_conversion.py [config_name] (default yolact_base)
"""
import sys, time
sys.path.insert(0, '.')
sys.path.insert(0, 'tests')
import numpy as np
import jax; jax.config.update('jax_platforms', 'cpu')
import yolact_tpu.utils.jax_setup
import torch
import _refutil

ref_yolact, ref_config, *_ = _refutil.import_reference()
name = sys.argv[1] if len(sys.argv) > 1 else 'yolact_base'
ref_config.set_cfg(name + '_config')
torch.manual_seed(0)
t0 = time.time()
net = ref_yolact.Yolact()
net.train()
print(f'reference model built ({time.time()-t0:.0f}s)', flush=True)

from yolact_tpu.config import get_config
from yolact_tpu.convert.torch_import import convert_state_dict
cfg = get_config(name)
sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
print('state dict keys:', len(sd), flush=True)
variables, unhandled = convert_state_dict(cfg, sd)
print('unhandled keys:', unhandled, flush=True)
assert not unhandled

rng = np.random.RandomState(0)
x = rng.rand(1, 3, cfg.max_size, cfg.max_size).astype(np.float32)
t0 = time.time()
with torch.no_grad():
    ref_out = net(torch.from_numpy(x))
print(f'reference forward ({time.time()-t0:.0f}s)', flush=True)

from yolact_tpu.models.yolact import Yolact
model = Yolact(cfg)
t0 = time.time()
ours, _ = model.apply(
    {'params': variables['params'], 'batch_stats': variables['batch_stats']},
    np.transpose(x, (0, 2, 3, 1)), train=True, mutable=['batch_stats'])
print(f'our forward ({time.time()-t0:.0f}s)', flush=True)

np.testing.assert_allclose(np.asarray(ours['priors']),
                           ref_out['priors'].numpy(), atol=1e-6)
for key in ('loc', 'conf', 'mask'):
    a = np.asarray(ours[key]); b = ref_out[key].numpy()
    d = np.abs(a - b).max()
    print(f'{key}: max abs diff {d:.2e}', flush=True)
    assert d < 5e-3, key
d = np.abs(np.asarray(ours['proto']) - ref_out['proto'].numpy()).max()
print(f'proto: max abs diff {d:.2e}', flush=True)
assert d < 5e-3
print(f'FULL-SIZE {name} conversion parity OK', flush=True)
