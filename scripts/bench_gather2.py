"""Round-3 DCN gather experiments: can anything beat XLA's block gather?

Context (PERF.md "DCN anatomy" + trace /tmp/prof_plus8): the XLA [2,2,C]
block gather is ISSUE-bound at ~10.7 cycles/sample (90 GB/s effective at
C=128, rising to 176 GB/s at C=512 — per-sample cost is ~constant), with
the operand already VMEM-resident.  Formulation changes that keep one
issue per sample (quad-lane layout, per-corner rows) all land within a
few % of each other.  Candidates that could actually move the bound:

  * tb:     stack rows y/y+1 in lanes -> xtb [B,H+1,W+2,2C]; ONE
            [1,2,2C] slice per sample = one fully-contiguous 1KB
            segment (block does 2 segments).  2x slab memory.
  * pallas: per-sample fori loop over a VMEM-resident flat slab with
            pl.ds dynamic loads + fused corner reduce (measures the
            achievable cycles/sample floor for scalar-issued loads).
  * taa:    jnp.take_along_axis INSIDE a pallas kernel — probes whether
            Mosaic lowers to a hardware dynamic-gather (sublane gather)
            that batches 8 samples per issue.  If this lowers + beats
            ~3 cyc/sample it is the 10x win; if it throws
            LoweringException, record the dead end.

All variants produce the REDUCED [B,N,C] bilinear output (not raw
corner blocks) so the comparison includes epilogue fusion effects.

    python scripts/bench_gather2.py [B=8] [iters=30] [--interpret]
"""
import os
import sys
import time
import traceback
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

INTERPRET = '--interpret' in sys.argv
SMALL = '--small' in sys.argv
ARGS = [a for a in sys.argv[1:] if not a.startswith('-')]
B = int(ARGS[0]) if len(ARGS) > 0 else 8
ITERS = int(ARGS[1]) if len(ARGS) > 1 else 30
H = W = 13 if SMALL else 69
C = 128
K2 = 9
N = H * W * K2          # samples per image
# pallas tile: compiled Mosaic requires the block sublane dim divisible
# by 8 (TILE=1023 compile-FAILED on chip 2026-08-19; odd tiles are
# interpret-only)
TILE = 128 if SMALL else 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    # DCN-like sample coordinates: sample (p, t) starts at the conv tap
    # grid and is perturbed per offset mode.  ROUND-5 RESULT
    # (results/gather_r5.txt, compiled with the fixed warmup): the
    # distribution barely matters — random 16.7 / iid 17.1 / smooth 19.4
    # ns/sample, and all-ZERO offsets are the SLOWEST case (63.3).  The
    # earlier "~100x locality-sensitive" reading came from the invalid
    # r4a numbers (fresh compile inside every timed call) and is
    # retracted; the sweep is kept because it documents that fact.
    kh = np.arange(3) - 1
    base_y = (np.arange(H)[:, None, None, None] + kh[None, None, :, None])
    base_x = (np.arange(W)[None, :, None, None] + kh[None, None, None, :])
    base_y = np.broadcast_to(base_y, (H, W, 3, 3)).reshape(1, N)
    base_x = np.broadcast_to(base_x, (H, W, 3, 3)).reshape(1, N)

    def coords(mode, sigma=1.5):
        if mode == 'random':     # uniform over the image — worst case
            oy = rng.rand(B, N) * (H - 1) - base_y
            ox = rng.rand(B, N) * (W - 1) - base_x
        elif mode == 'zero':     # zero-init offsets = bench weights today
            oy = np.full((B, N), 0.0)
            ox = np.full((B, N), 0.0)
        elif mode == 'iid':      # iid N(0, sigma) per sample — pessimistic
            oy = rng.randn(B, N) * sigma
            ox = rng.randn(B, N) * sigma
        elif mode == 'smooth':   # spatially smooth field (box-blurred iid,
            # renormalized to sigma) — what a conv-produced offset map
            # actually looks like
            def field():
                f = rng.randn(B, H, W, 9)
                for ax in (1, 2):
                    f = (np.roll(f, 1, ax) + f + np.roll(f, -1, ax)) / 3.0
                f *= sigma / (f.std() + 1e-9)
                return f.reshape(B, N)
            oy = field()
            ox = field()
        else:
            raise ValueError(mode)
        ys = np.clip(base_y + oy, -1.0, H).astype(np.float32)
        xs = np.clip(base_x + ox, -1.0, W).astype(np.float32)
        return jnp.asarray(ys), jnp.asarray(xs)

    ys, xs = coords('random')
    out_bytes = B * N * 4 * C * 2

    def corners(ys, xs):
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        return (y0.astype(jnp.int32), x0.astype(jnp.int32),
                (ys - y0), (xs - x0))

    # ---- reference (numpy) ----------------------------------------------
    def ref_bilinear():
        xn = np.asarray(x.astype(jnp.float32))
        yy = np.asarray(ys)
        xx = np.asarray(xs)
        y0 = np.floor(yy).astype(np.int64)
        x0 = np.floor(xx).astype(np.int64)
        wy1 = yy - y0
        wx1 = xx - x0
        out = np.zeros((B, N, C), np.float32)
        for dy, dx, w in ((0, 0, (1 - wy1) * (1 - wx1)),
                          (0, 1, (1 - wy1) * wx1),
                          (1, 0, wy1 * (1 - wx1)),
                          (1, 1, wy1 * wx1)):
            yc = y0 + dy
            xc = x0 + dx
            valid = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
            ycc = np.clip(yc, 0, H - 1)
            xcc = np.clip(xc, 0, W - 1)
            for b in range(B):
                out[b] += (w[b] * valid[b])[:, None] * xn[b, ycc[b], xcc[b]]
        return out

    # ---- current prod formulation (block) -------------------------------
    def block(x, ys, xs):
        from yolact_tpu.kernels.dcn import _bilinear_gather
        return _bilinear_gather(x, ys, xs)

    # ---- tb: rows y/y+1 stacked in lanes, one [1,2,2C] slice ------------
    def tb(x, ys, xs):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xtb = jnp.concatenate([xp[:, :-1], xp[:, 1:]], axis=-1)  # [B,H+1,W+2,2C]
        y0i, x0i, wy1, wx1 = corners(ys, xs)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0).reshape(-1, 1)
        starts = jnp.concatenate([
            b_idx,
            jnp.clip(y0i + 1, 0, H).reshape(-1, 1),
            jnp.clip(x0i + 1, 0, W).reshape(-1, 1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2))
        blk = jax.lax.gather(
            xtb, starts, dn, slice_sizes=(1, 1, 2, 2 * C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # [B*N, 2, 2C]
        # corner weights: lanes 0..C-1 = row y0, lanes C..2C-1 = row y0+1
        def cw(dy, dx, w):
            valid = ((y0i + dy >= 0) & (y0i + dy < H) &
                     (x0i + dx >= 0) & (x0i + dx < W))
            return (w * valid).astype(x.dtype).reshape(-1, 1)
        w4 = jnp.stack([  # [B*N, 2(x), 2(y-in-lanes)] -> match blk [n, x, yC]
            jnp.concatenate([cw(0, 0, (1 - wy1) * (1 - wx1)),
                             cw(1, 0, wy1 * (1 - wx1))], axis=-1),
            jnp.concatenate([cw(0, 1, (1 - wy1) * wx1),
                             cw(1, 1, wy1 * wx1)], axis=-1),
        ], axis=1)                                          # [B*N, 2, 2]
        prod = blk.reshape(-1, 2, 2, C) * w4[..., None]     # [B*N,2,2,C]
        return jnp.sum(prod, axis=(1, 2)).reshape(B, N, C)

    # ---- pallas per-sample loop -----------------------------------------
    Wp = W + 2
    R = (H + 2) * Wp
    NT = -(-N // TILE)

    def pallas_kernel(yx_ref, w4_ref, slab_ref, out_ref):
        # yx_ref: [1, TILE, 2] int32 (SMEM) flat row starts (top, bottom)
        # w4_ref: [1, TILE, 4] f32 (SMEM) corner weights (00,01,10,11) —
        #   VMEM scalar reads at a dynamic sublane index are a Mosaic
        #   dynamic_slice (unimplemented); SMEM scalar loads are supported
        # slab_ref: [1, R, C] bf16 (VMEM) padded flat feature map (one image)
        # out_ref: [1, TILE, C] bf16
        def body(i, _):
            r0 = yx_ref[0, i, 0]
            r1 = yx_ref[0, i, 1]
            top = slab_ref[0, pl.ds(r0, 2), :].astype(jnp.float32)  # [2, C]
            bot = slab_ref[0, pl.ds(r1, 2), :].astype(jnp.float32)  # [2, C]
            acc = (top[0:1] * w4_ref[0, i, 0] + top[1:2] * w4_ref[0, i, 1] +
                   bot[0:1] * w4_ref[0, i, 2] + bot[1:2] * w4_ref[0, i, 3])
            out_ref[0, pl.ds(i, 1), :] = acc.astype(out_ref.dtype)
            return 0
        jax.lax.fori_loop(0, TILE, body, 0)

    def pallas_loop(x, ys, xs):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        slab = xp.reshape(B, R, C)
        y0i, x0i, wy1, wx1 = corners(ys, xs)
        yc = jnp.clip(y0i + 1, 0, H)
        xc = jnp.clip(x0i + 1, 0, W)
        r0 = yc * Wp + xc
        r1 = r0 + Wp
        npad = NT * TILE - N
        yx = jnp.stack([r0, r1], axis=-1)                    # [B, N, 2]
        yx = jnp.pad(yx, ((0, 0), (0, npad), (0, 0)))
        def cw(dy, dx, w):
            valid = ((y0i + dy >= 0) & (y0i + dy < H) &
                     (x0i + dx >= 0) & (x0i + dx < W))
            return (w * valid).astype(jnp.float32)
        w4 = jnp.stack([cw(0, 0, (1 - wy1) * (1 - wx1)),
                        cw(0, 1, (1 - wy1) * wx1),
                        cw(1, 0, wy1 * (1 - wx1)),
                        cw(1, 1, wy1 * wx1)], axis=-1)       # [B, N, 4]
        w4 = jnp.pad(w4, ((0, 0), (0, npad), (0, 0)))
        out = pl.pallas_call(
            pallas_kernel,
            grid=(B, NT),
            in_specs=[
                pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, TILE, 4), lambda b, t: (b, t, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, C), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NT * TILE, C), x.dtype),
            interpret=INTERPRET,
        )(yx, w4, slab)
        return out[:, :N]

    # ---- taa: take_along_axis inside a pallas kernel --------------------
    # KNOWN DEAD END (diagnosed round 5, explains the bare
    # "AssertionError:" lines in results/gather_r4a.txt): jax 0.9.0's
    # Mosaic gather rule (jax/_src/pallas/mosaic/lowering.py,
    # _gather_lowering_rule) only accepts the SAME-SHAPE form and guards
    # it with a bare `assert indices_aval.shape == in_aval.shape + (1,)`.
    # These kernels gather [TILE, C] indices from an [R, C] slab
    # (TILE=1024 != R=5041), so the jax-side assert fires before Mosaic
    # even sees the op — the same same-shape constraint the round-4
    # burial proof padded around (probe_sameshape_gather.py), surfacing
    # one layer earlier with no message.  Kept as measurement history.
    def taa_kernel(idx_ref, slab_ref, out_ref):
        # idx_ref: [1, TILE, C] int32 row index broadcast over lanes
        # slab_ref: [1, R, C]; out_ref: [1, TILE, C]
        out_ref[0] = jnp.take_along_axis(
            slab_ref[0], idx_ref[0], axis=0)

    def pallas_taa(x, ys, xs):
        # top-left corner row only (probe op support/speed, not full bilinear)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        slab = xp.reshape(B, R, C)
        y0i, x0i, _, _ = corners(ys, xs)
        r0 = (jnp.clip(y0i + 1, 0, H) * Wp + jnp.clip(x0i + 1, 0, W))
        npad = NT * TILE - N
        idx = jnp.pad(r0, ((0, 0), (0, npad)))
        idx = jnp.broadcast_to(idx[..., None], (B, NT * TILE, C))
        out = pl.pallas_call(
            taa_kernel,
            grid=(B, NT),
            in_specs=[
                pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, R, C), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NT * TILE, C), x.dtype),
            interpret=INTERPRET,
        )(idx, slab)
        return out[:, :N]

    # ---- taa4: full bilinear via 4 in-kernel take_along_axis gathers ----
    def taa4_kernel(idx_ref, w4_ref, slab_ref, out_ref):
        # idx_ref: [1, TILE, C] int32 top-left flat row, broadcast over lanes
        # w4_ref: [1, TILE, 4*C] f32 corner weights tiled over lanes
        # slab_ref: [1, R, C]; out_ref: [1, TILE, C]
        slab = slab_ref[0]
        idx = idx_ref[0]
        w = w4_ref[0].astype(jnp.float32)
        # misread corners are zero-weighted; clamp keeps the reads in
        # bounds at the far edge of the padded slab
        acc = jnp.take_along_axis(slab, idx, axis=0).astype(jnp.float32) \
            * w[:, 0 * C:1 * C]
        acc += jnp.take_along_axis(slab, jnp.minimum(idx + 1, R - 1),
                                   axis=0).astype(jnp.float32) \
            * w[:, 1 * C:2 * C]
        acc += jnp.take_along_axis(slab, jnp.minimum(idx + Wp, R - 1),
                                   axis=0).astype(jnp.float32) \
            * w[:, 2 * C:3 * C]
        acc += jnp.take_along_axis(slab, jnp.minimum(idx + Wp + 1, R - 1),
                                   axis=0).astype(jnp.float32) \
            * w[:, 3 * C:4 * C]
        out_ref[0] = acc.astype(out_ref.dtype)

    def pallas_taa4(x, ys, xs):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        slab = xp.reshape(B, R, C)
        y0i, x0i, wy1, wx1 = corners(ys, xs)
        r0 = (jnp.clip(y0i + 1, 0, H) * Wp + jnp.clip(x0i + 1, 0, W))
        npad = NT * TILE - N

        def cw(dy, dx, w):
            valid = ((y0i + dy >= 0) & (y0i + dy < H) &
                     (x0i + dx >= 0) & (x0i + dx < W))
            return (w * valid).astype(jnp.float32)
        w4 = jnp.stack([cw(0, 0, (1 - wy1) * (1 - wx1)),
                        cw(0, 1, (1 - wy1) * wx1),
                        cw(1, 0, wy1 * (1 - wx1)),
                        cw(1, 1, wy1 * wx1)], axis=-1)       # [B, N, 4]
        w4 = jnp.pad(w4, ((0, 0), (0, npad), (0, 0)))
        w4 = jnp.repeat(w4, C, axis=-1)                      # [B, NT*TILE, 4C]
        idx = jnp.pad(r0, ((0, 0), (0, npad)))
        idx = jnp.broadcast_to(idx[..., None], (B, NT * TILE, C))
        out = pl.pallas_call(
            taa4_kernel,
            grid=(B, NT),
            in_specs=[
                pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, TILE, 4 * C), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, R, C), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NT * TILE, C), x.dtype),
            interpret=INTERPRET,
        )(idx, w4, slab)
        return out[:, :N]

    # ---- harness ---------------------------------------------------------
    ref = ref_bilinear()

    def check(name, fn, against='bilinear'):
        try:
            r = np.asarray(jax.jit(fn)(x, ys, xs).astype(jnp.float32))
        except Exception as e:  # noqa: BLE001 — record lowering dead ends
            print(f'{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}')
            return False
        if against == 'bilinear':
            err = np.abs(r - ref).max()
        else:  # top-left corner row fetch
            xn = np.asarray(x.astype(jnp.float32))
            xpn = np.pad(xn, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y0 = np.clip(np.floor(np.asarray(ys)).astype(np.int64) + 1, 0, H)
            x0 = np.clip(np.floor(np.asarray(xs)).astype(np.int64) + 1, 0, W)
            exp = np.stack([xpn[b, y0[b], x0[b]] for b in range(B)])
            err = np.abs(r - exp).max()
        ok = err < 0.03
        print(f'{name:8s} check {"OK" if ok else "MISMATCH"} (max err {err:.4f})')
        return ok

    def timeit(name, fn, ys=ys, xs=xs):
        # bench.py methodology: chain iterations ON DEVICE through a data
        # dependency (per-host-iteration scalar fetches pay the relay RTT
        # each time — that is what flattened scripts/bench_gather.py's
        # numbers to ~RTT for every formulation), fetch one scalar at the
        # end as the completion fence.
        def chained(x, ys, xs, n):
            def body(_, carry):
                ys_c, acc = carry
                r = fn(x, ys_c, xs)
                s = jnp.sum(r[:1, :1].astype(jnp.float32)) * 1e-12
                return ys_c + s, acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (ys, 0.0))
            return acc
        f = jax.jit(chained, static_argnums=3)
        # compile and warm-execute SEPARATELY so failures are labeled by
        # phase (round 4 mislabeled warm-exec AssertionErrors as "compile
        # FAILED" — results/gather_r4a.txt), and warm with the SAME static
        # n as the timed call: a different n is a different jit
        # specialization, and the old n=2 warmup made the timed call pay a
        # fresh ~10 s remote compile.
        def _fail(phase, e):
            # last actual stack frame (file:line), not a message line —
            # multi-line jax messages made tb[-2] point at message text
            frames = traceback.extract_tb(e.__traceback__)
            site = (f'{frames[-1].filename}:{frames[-1].lineno}'
                    if frames else '?')
            msg = ' '.join(str(e).split())[:200]  # flatten newlines
            print(f'{name:8s} {phase} FAILED: {type(e).__name__}: '
                  f'{msg} @ {site}')
        try:
            compiled = f.lower(x, ys, xs, ITERS).compile()
        except Exception as e:  # noqa: BLE001
            _fail('compile', e)
            return
        try:
            float(compiled(x, ys, xs))
        except Exception as e:  # noqa: BLE001
            _fail('warm', e)
            return
        t0 = time.perf_counter()
        # perturbed input so the relay cannot coalesce-cache the dispatch
        float(compiled(x, ys + 1e-6, xs))
        dt = (time.perf_counter() - t0) / ITERS
        ns = dt * 1e9 / (B * N)
        print(f'{name:8s} {dt*1e3:8.3f} ms/batch  {out_bytes/dt/1e9:7.1f} GB/s'
              f'  {ns:6.2f} ns/sample')

    print(f'B={B} N={N} C={C} interpret={INTERPRET}')
    check('block', block)
    check('tb', tb)
    check('pallas', pallas_loop)
    check('taa', pallas_taa, against='corner')
    check('taa4', pallas_taa4)
    if not INTERPRET:
        # offset-distribution sweep: the XLA gather is locality-sensitive,
        # the Pallas in-kernel gather may not be — measure both across the
        # zero (bench today) / smooth+iid (trained-like) / random (worst)
        # regimes
        for mode in ('zero', 'smooth', 'iid', 'random'):
            ys_m, xs_m = coords(mode)
            timeit(f'block/{mode}', block, ys_m, xs_m)
            timeit(f'taa4/{mode}', pallas_taa4, ys_m, xs_m)
        timeit('pallas/random', pallas_loop)
        timeit('taa/random', pallas_taa)
        timeit('tb/random', tb)


if __name__ == '__main__':
    main()
