"""On-chip probe: does Mosaic's same-shape dynamic gather lower, and how fast?

Mosaic's gather lowering (jax 0.9.0, pallas/mosaic/lowering.py:2464-2524)
supports exactly one primitive: ``tpu.dynamic_gather(x, idx, [d])`` where
operand, indices, and output are all the SAME 2D shape, d in {0 (sublanes),
1 (lanes)}.  Round 3's kernel gathered TILE_P rows out of an R-row slab —
structurally un-lowerable.  This probe measures the form that LOOKS
lowerable from the jax-side checks: pad output positions P up to the slab
row count R (for stride-1 DCN, R=(H+2)(W+2) is within ~6% of P=HW) and
gather with indices shaped like the operand.

Verdict (results/dcn_pallas_r4.txt): even the same-shape form dies in the
Mosaic backend — ``tpu.dynamic_gather`` is a *vreg-local shuffle*
("Not implemented: Multiple source vregs along gather dimension"): the
gather extent must fit one vreg (8 sublanes / 128 lanes).  The positive
controls below (extent 8 sublane / extent 128 lane) DO lower and run,
proving the diagnosis.  A VMEM-resident scattered read over a ~5000-row
feature slab is structurally inexpressible in Pallas on this stack; the
XLA gather formulation in ``kernels/dcn.py`` is the production path.

Variants x dtypes, at the real yolact_plus stage-2 DCN shape:
  sub/f32  : [L, C] operand, gather along sublanes (natural NHWC slab)
  sub/bf16
  lane/f32 : [C, L] operand, gather along lanes (transposed slab)
  lane/bf16
plus vreg-local positive controls:
  ctl-sub  : [8, 128] operand, gather along sublanes (extent 8 = 1 vreg)
  ctl-lane : [8, 128] operand, gather along lanes (extent 128 = 1 vreg)

    python scripts/probe_sameshape_gather.py [L] [C]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make_gather(L, C, dtype, axis):
    """Same-shape take_along_axis along `axis` of an [A0, A1] block."""
    shape = (L, C) if axis == 0 else (C, L)

    def kernel(idx_ref, slab_ref, out_ref):
        idx1 = idx_ref[0]
        if axis == 0:
            idx = jnp.broadcast_to(idx1[:, None], shape)
        else:
            idx = jnp.broadcast_to(idx1[None, :], shape)
        out_ref[0] = jnp.take_along_axis(
            slab_ref[0], idx, axis=axis, mode='promise_in_bounds')

    @jax.jit
    def run(idx, slab):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, L), lambda b: (b, 0)),
                      pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1,) + shape, dtype),
        )(idx, slab)
    return run


DECISIVE_MARKERS = ('Not implemented', 'NotImplemented', 'Multiple source',
                    'Mosaic failed', 'INTERNAL', 'Unsupported')


def _decisive(msg):
    keys = [ln.strip() for ln in msg.splitlines()
            if any(m in ln for m in DECISIVE_MARKERS)]
    return ' | '.join(keys[:3]) if keys else msg[:300]


def run_case(name, L, C, axis, dtype, rng):
    dname = 'f32' if dtype == jnp.float32 else 'bf16'
    idx_np = rng.randint(0, L, size=(1, L)).astype(np.int32)
    slab_np = rng.randn(1, L, C).astype(np.float32)
    slab = jnp.asarray(slab_np).astype(dtype)
    if axis == 1:
        slab = jnp.transpose(slab, (0, 2, 1))
    idx = jnp.asarray(idx_np)
    try:
        fn = make_gather(L, C, dtype, axis)
        got = np.asarray(fn(idx, slab), np.float32)
    except Exception as e:  # noqa: BLE001 — recording dead ends
        print(f'{name}/{dname:4s} FAILED: {type(e).__name__}: '
              f'{_decisive(str(e))}')
        return False
    want = np.asarray(
        jnp.asarray(slab_np[0, idx_np[0]]).astype(dtype), np.float32)
    got2 = got[0].T if axis == 1 else got[0]
    err = np.abs(got2 - want).max()
    ok = err < (0.05 if dtype == jnp.bfloat16 else 1e-5)
    # timing: chain 50 dependent gathers inside one jit to swamp relay
    # dispatch; idx perturbed per step so nothing folds away
    N_CHAIN = 50

    @jax.jit
    def chained(idx, slab):
        def body(i, s):
            out = fn(jnp.clip(idx + i, 0, L - 1), slab)
            return s + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, N_CHAIN, body, 0.0)

    chained(idx, slab).block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        chained(idx, slab).block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * N_CHAIN)
    elems = L * C
    nbytes = elems * (4 if dtype == jnp.float32 else 2)
    print(f'{name}/{dname:4s} {"OK" if ok else f"ERR {err:.2g}":6s} '
          f'{dt * 1e6:9.2f} us/gather {dt / elems * 1e9:8.3f} ns/elem '
          f'{nbytes / dt / 1e9:7.2f} GB/s')
    return ok


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 5048
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.RandomState(0)
    print(f'L={L} C={C} on {jax.devices()[0]}')
    any_big = False
    for name, axis in (('sub', 0), ('lane', 1)):
        for dtype in (jnp.float32, jnp.bfloat16):
            any_big |= run_case(name, L, C, axis, dtype, rng)
    # positive controls: gather extent fits one vreg -> must lower
    print('-- vreg-local positive controls (extent <= 1 vreg) --')
    ctl_ok = run_case('ctl-sub ', 8, 128, 0, jnp.float32, rng)
    ctl_ok &= run_case('ctl-lane', 128, 8, 1, jnp.float32, rng)
    if any_big:
        print('VERDICT: same-shape slab gather LOWERS — kernel is viable')
    elif ctl_ok:
        print('VERDICT: vreg-local only — slab-scale Pallas gather is '
              'structurally inexpressible on this stack')
    else:
        print('VERDICT: inconclusive (controls also failed)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
