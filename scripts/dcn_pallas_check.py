"""Compiled-on-chip parity check for kernels/dcn_pallas.py at the real
yolact_plus DCN stage shapes (the interpret-mode tests in tests/test_dcn.py
validate semantics; this validates the Mosaic lowering on hardware).

Stages (550-input yolact_plus ResNet, NHWC, bf16 like the bench):
  stage2: 69x69xC128 (stride-2 block 0 downsamples 138->69)
  stage3: 35x35xC256
  stage4: 18x18xC512

    python scripts/dcn_pallas_check.py [--loop]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if '--loop' in sys.argv:
    os.environ['YOLACT_TPU_PALLAS_DCN_LOOP'] = '1'


def main():
    import jax
    import jax.numpy as jnp
    from yolact_tpu.kernels.dcn import deform_conv2d
    from yolact_tpu.kernels.dcn_pallas import deform_conv2d_pallas

    rng = np.random.RandomState(0)
    cases = [
        ('stage2-s2', 8, 138, 138, 128, 128, 2),
        ('stage2', 8, 69, 69, 128, 128, 1),
        ('stage3', 8, 35, 35, 256, 256, 1),
        ('stage4', 8, 18, 18, 512, 512, 1),
    ]
    K = 3
    ok_all = True
    for name, B, H, W, Cin, Cout, stride in cases:
        Ho = (H + 2 - K) // stride + 1
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32)
                        ).astype(jnp.bfloat16)
        off = jnp.asarray((rng.randn(B, Ho, Ho, 2 * K * K) * 2
                           ).astype(np.float32))
        mask = jnp.asarray(rng.rand(B, Ho, Ho, K * K).astype(np.float32))
        w = jnp.asarray((rng.randn(K, K, Cin, Cout) * 0.05
                         ).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.randn(Cout).astype(np.float32))
        want = np.asarray(jax.jit(
            lambda *a: deform_conv2d(*a, stride=stride, padding=1)
        )(x, off, mask, w, b), np.float32)
        try:
            got = np.asarray(jax.jit(
                lambda *a: deform_conv2d_pallas(*a, stride=stride, padding=1)
            )(x, off, mask, w, b), np.float32)
        except Exception as e:  # noqa: BLE001 — record lowering dead ends
            print(f'{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}')
            ok_all = False
            continue
        # bf16 inputs, f32 accumulation both sides: bf16-level agreement
        scale = np.abs(want).max() + 1e-6
        err = np.abs(got - want).max() / scale
        ok = err < 0.02
        ok_all &= ok
        print(f'{name:10s} {"OK" if ok else "MISMATCH"} '
              f'(rel err {err:.5f}, out {got.shape})')
    print('ALL OK' if ok_all else 'FAILURES')
    return 0 if ok_all else 1


if __name__ == '__main__':
    sys.exit(main())
