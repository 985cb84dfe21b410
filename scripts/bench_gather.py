"""Microbenchmark: DCN bilinear-sampling gather formulations on TPU.

Measures the op-level ceiling for the deformable-conv sample gather at the
yolact_plus stage-2 shape (the hot one): feature map [B,69,69,128] bf16,
N = 69*69*9 samples/img.  Formulations:

  * quad:   ONE slice of a contiguous 4C lane run from xquad [B,H+1,W+1,4C]
            (current kernels/dcn.py)
  * block:  ONE [2,2,C] block slice from the zero-padded map (round-3 v2)
  * rows:   four per-corner [1,C] row gathers via take_along_axis (round-2)
  * dense:  same output volume moved with a DENSE reshape+copy — the
            no-gather bandwidth ceiling for comparison

Prints ms/batch and effective GB/s (gathered bytes / time).

    python scripts/bench_gather.py [B=8] [iters=30]
"""
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    H = W = 69
    C = 128
    K2 = 9
    N = H * W * K2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    # trained-like offsets: small, centered
    ys = jnp.asarray(np.clip(rng.rand(B, N) * H, 0, H - 1).astype(np.float32))
    xs = jnp.asarray(np.clip(rng.rand(B, N) * W, 0, W - 1).astype(np.float32))
    out_bytes = B * N * 4 * C * 2  # 4 corners, bf16

    def fence(v):
        return float(jnp.sum(v.astype(jnp.float32)) * 1e-9)

    def timeit(name, fn):
        f = jax.jit(fn)
        r = f(x, ys, xs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        # chain iterations through a scalar fold so the relay cannot
        # coalesce/overlap them (bench.py methodology)
        acc = 0.0
        xx = x
        for i in range(iters):
            r = f(xx, ys + acc, xs)
            acc = float(jnp.sum(r[:1, :1].astype(jnp.float32))) * 1e-12
            xx = xx.at[0, 0, 0, 0].add(np.float32(acc))
        dt = (time.perf_counter() - t0) / iters
        print(f'{name:6s} {dt*1e3:8.3f} ms/batch   '
              f'{out_bytes/dt/1e9:7.1f} GB/s effective')

    def corners(ys, xs):
        y0 = jnp.floor(ys); x0 = jnp.floor(xs)
        return y0.astype(jnp.int32), x0.astype(jnp.int32)

    def quad(x, ys, xs):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xq = jnp.concatenate([xp[:, :-1, :-1], xp[:, :-1, 1:],
                              xp[:, 1:, :-1], xp[:, 1:, 1:]], axis=-1)
        y0i, x0i = corners(ys, xs)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0).reshape(-1, 1)
        starts = jnp.concatenate([b_idx,
                                  jnp.clip(y0i + 1, 0, H).reshape(-1, 1),
                                  jnp.clip(x0i + 1, 0, W).reshape(-1, 1)], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1, 2),
            start_index_map=(0, 1, 2))
        return jax.lax.gather(xq, starts, dn, slice_sizes=(1, 1, 1, 4 * C),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def block(x, ys, xs):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y0i, x0i = corners(ys, xs)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0).reshape(-1, 1)
        starts = jnp.concatenate([b_idx,
                                  jnp.clip(y0i + 1, 0, H).reshape(-1, 1),
                                  jnp.clip(x0i + 1, 0, W).reshape(-1, 1)], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        return jax.lax.gather(xp, starts, dn, slice_sizes=(1, 2, 2, C),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def rows(x, ys, xs):
        xf = x.reshape(B, H * W, C)
        y0i, x0i = corners(ys, xs)
        y0c = jnp.clip(y0i, 0, H - 1); x0c = jnp.clip(x0i, 0, W - 1)
        y1c = jnp.clip(y0i + 1, 0, H - 1); x1c = jnp.clip(x0i + 1, 0, W - 1)
        outs = []
        for yy, xx_ in ((y0c, x0c), (y0c, x1c), (y1c, x0c), (y1c, x1c)):
            idx = (yy * W + xx_)[..., None]
            outs.append(jnp.take_along_axis(xf, idx, axis=1))
        return jnp.stack(outs, 2)

    def dense(x, ys, xs):
        # dense bandwidth ceiling: write the same volume without gathering
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xq = jnp.concatenate([xp[:, :-1, :-1], xp[:, :-1, 1:],
                              xp[:, 1:, :-1], xp[:, 1:, 1:]], axis=-1)
        reps = -(-N // ((H + 1) * (W + 1)))  # ceil: tile to >= N rows
        big = jnp.tile(xq.reshape(B, -1, 4 * C), (1, reps, 1))[:, :N]
        return big + ys[..., None].astype(big.dtype) * 0

    timeit('dense', dense)
    timeit('quad', quad)
    timeit('block', block)
    timeit('rows', rows)


if __name__ == '__main__':
    main()
