"""Validate tests/_refutil.install_ref_dcn_shim against our kernels/dcn.py.

The shim is a pure-torch transcription of the reference CUDA DCNv2
semantics (external/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu); our kernel is
oracle-tested against a numpy transcription of the same CUDA source
(tests/test_dcn.py).  If shim == ours in float64, the shim is semantically
exact and any float32 gap is accumulation-order noise.

Run on CPU: JAX_PLATFORMS=cpu python scripts/check_ref_dcn_shim.py
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import numpy as np
import torch

import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from _refutil import import_reference, install_ref_dcn_shim
from yolact_tpu.kernels.dcn import deform_conv2d

import_reference()
DCN = install_ref_dcn_shim()


def compare(B, H, W, Cin, Cout, stride, padding, dilation, dtype, seed=0):
    """Compare the shim's dcn_v2_conv against our deform_conv2d directly
    (the module path adds conv_offset_mask, whose missing-dilation quirk
    the reference shares — see install_ref_dcn_shim; the module-level
    chunk/cat layout is a no-op reorder, exercised by the oracle test)."""
    torch.manual_seed(seed)
    tdt = {np.float32: torch.float32, np.float64: torch.float64}[dtype]
    m = DCN(Cin, Cout, 3, stride=1, padding=1).to(tdt)  # weights/bias only
    K = 3
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    x = torch.randn(B, Cin, H, W, dtype=tdt)
    offset_t = torch.randn(B, 2 * K * K, Ho, Wo, dtype=tdt) * 2.0
    mask_t = torch.rand(B, K * K, Ho, Wo, dtype=tdt)
    with torch.no_grad():
        ref = DCN.dcn_v2_conv(x, offset_t, mask_t, m.weight, m.bias,
                              stride, padding, dilation).numpy()

    # shim offset channel 2t=dy_t, 2t+1=dx_t == our interleaved layout
    offset = offset_t.permute(0, 2, 3, 1).numpy()
    mask = mask_t.permute(0, 2, 3, 1).numpy()
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    wj = jnp.asarray(m.weight.detach().permute(2, 3, 1, 0).numpy())  # KKIO
    bj = jnp.asarray(m.bias.detach().numpy())
    ours = deform_conv2d(xj, jnp.asarray(offset), jnp.asarray(mask), wj, bj,
                         stride=stride, padding=padding, dilation=dilation)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-9)
    name = np.dtype(dtype).name
    print(f'  B{B} {H}x{W} {Cin}->{Cout} s{stride} p{padding} d{dilation} '
          f'{name}: max abs {err:.3e}  rel {rel:.3e}')
    return rel


def main():
    worst = 0.0
    cases = [
        (2, 13, 17, 8, 16, 1, 1, 1),
        (2, 13, 17, 8, 16, 2, 1, 1),
        (1, 9, 9, 4, 8, 1, 2, 2),    # atrous DCNLayer instantiation
        (2, 7, 7, 8, 8, 1, 1, 1),
    ]
    for dtype in (np.float64, np.float32):
        for c in cases:
            worst = max(worst, compare(*c, dtype))
        if dtype is np.float64:
            # our GEMM accumulates f32 (preferred_element_type), so ~3e-8
            # rel noise remains even on f64 inputs; a semantic bug
            # (channel scrambling, OOB mismatch) would be O(0.1-1)
            assert worst < 1e-6, f'f64 mismatch {worst:.3e} — SEMANTIC bug'
            print(f'f64: rel {worst:.2e} — shim semantics match '
                  'kernels/dcn.py (residual = f32 GEMM accumulation)')
            worst = 0.0
    print(f'f32 worst rel err {worst:.3e} (accumulation-order noise)')
    print('SHIM OK')


if __name__ == '__main__':
    main()
