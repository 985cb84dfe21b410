"""Training-step throughput benchmark on one TPU chip.

Full yolact_base train step at 550x550 — forward, full MultiBox loss (B/C/M/S),
backward, SGD update — on a synthetic batch.  Same chained-dependency
methodology as bench.py (this host's relay coalesces identical async
dispatches, so each iteration folds the previous loss into one input pixel
to force genuinely serial device execution).

    python scripts/bench_train.py [batch=8] [iters=10] [dtype=float32] [s2d]

Pass ``s2d`` as the 4th arg to bench with the space-to-depth training stem
(``cli/train.py --stem_s2d``).

Reference point: the reference trains yolact_base at ~1.7 it/s @ batch 8 on
one GPU (800k iters / ~5.5 days, README-derived; see README.md perf table).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import yolact_tpu.utils.jax_setup  # noqa: E402,F401  persistent compile cache


def main():
    import jax
    import jax.numpy as jnp

    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import Yolact  # noqa: F401 (cfg classes)
    from yolact_tpu.train.step import create_train_state, train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'float32'
    profile_dir = os.environ.get('BENCH_PROFILE_DIR')

    stem_s2d = len(sys.argv) > 4 and sys.argv[4] == 's2d'
    config_name = os.environ.get('BENCH_TRAIN_CONFIG', 'yolact_base')
    cfg = get_config(config_name).copy(compute_dtype=dtype,
                                       stem_s2d=stem_s2d)
    model, state = create_train_state(cfg, seed=0)

    S, G = cfg.max_size, 32
    rng = np.random.RandomState(0)
    data = dict(
        image=jnp.asarray(rng.rand(batch, S, S, 3).astype(np.float32)),
        # proper boxes (x1<x2, y1<y2): with 4 independent uniforms some
        # boxes invert, and the roi-pool-emulating mask-loss normalizer
        # then divides by a NEGATIVE area -> nonsense negative loss
        gt_boxes=jnp.asarray(np.tile(np.concatenate([
            xy := rng.rand(1, G, 2).astype(np.float32) * 0.5 + 0.05,
            xy + rng.rand(1, G, 2).astype(np.float32) * 0.4 + 0.05,
        ], axis=-1), (batch, 1, 1))),
        gt_labels=jnp.asarray(
            rng.randint(1, cfg.num_classes, (batch, G)).astype(np.int32)),
        gt_masks=jnp.asarray(
            rng.randint(0, 2, (batch, G, S, S)).astype(np.uint8)),
        num_gts=jnp.full(batch, G - 1, jnp.int32),
        num_crowds=jnp.ones(batch, jnp.int32))

    # production default (cli/train.py): lincomb configs ship
    # pre-downsampled packed proto/seg targets instead of full-res masks;
    # BENCH_TRAIN_MULTIRES=0 benches the legacy full-res path
    from yolact_tpu.config import MaskType
    if (os.environ.get('BENCH_TRAIN_MULTIRES', '1') != '0'
            and cfg.mask_type == MaskType.LINCOMB
            and cfg.mask_proto_binarize_downsampled_gt):
        from yolact_tpu.ops.anchors import proto_size, seg_size
        from yolact_tpu.ops.bits import pack_bits_last
        from yolact_tpu.ops.resize import resize_bilinear_torch_np
        soft = np.asarray(data.pop('gt_masks')).astype(np.float32)
        data['gt_masks_proto_packed'] = jnp.asarray(pack_bits_last(
            resize_bilinear_torch_np(soft, proto_size(cfg)) > 0.5))
        if cfg.use_semantic_segmentation_loss:
            data['gt_masks_seg_packed'] = jnp.asarray(pack_bits_last(
                resize_bilinear_torch_np(soft, seg_size(cfg)) > 0.5))

    @jax.jit
    def chained(state, data, n):
        def body(i, carry):
            st, d, acc = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            st, losses = train_step(cfg, model, st, d, key)
            s = losses['total'] * 1e-9
            d = dict(d, image=d['image'].at[0, 0, 0, 0].add(s))
            return st, d, acc + losses['total']
        st, _, acc = jax.lax.fori_loop(0, n, body, (state, data, 0.0))
        return st, acc

    # compile + settle.  Through this host's TPU relay,
    # jax.block_until_ready can return before remote execution finishes;
    # fetching the scalar (float()) is the only reliable completion fence.
    # Each rep perturbs the input so no dispatch is byte-identical to a
    # previous one (the relay dedups identical async dispatches).
    #
    # WATCHDOG GUARD: this rig kills any single device dispatch longer
    # than roughly a minute ("TPU worker process crashed or restarted" —
    # NOTES.md "plus-train crash: root cause").  Measure one iteration
    # first and cap the chained trip count so a dispatch stays under ~25 s
    # (the fori_loop trip count is a traced arg, so no recompile).
    st, acc = chained(state, data, 1)
    _ = float(acc)
    t0 = time.perf_counter()
    st, acc = chained(state, dict(data, image=data['image'] + 1e-8), 1)
    _ = float(acc)
    s_per_iter = time.perf_counter() - t0
    chunk = max(1, min(iters, int(25.0 / max(s_per_iter, 1e-3))))
    if chunk < iters:
        print(f'# watchdog guard: {s_per_iter:.2f} s/iter measured -> '
              f'chained dispatches capped at {chunk} iters', file=sys.stderr)

    def run_iters(d, n):
        """n iterations as ceil(n/chunk) chained dispatches (each chunk
        restarts from the initial state, like the timing reps always did),
        fencing every dispatch."""
        acc_total = 0.0
        left = n
        while left > 0:
            k = min(chunk, left)
            _, acc = chained(state, d, k)
            acc_total += float(acc)  # fence each dispatch
            d = dict(d, image=d['image'] + 1e-9)
            left -= k
        return acc_total

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            d = dict(data, image=data['image'] + 1e-7)
            _, acc2 = chained(state, d, 3)
            _ = float(acc2)  # completion fence inside the trace
        print(f'# profile written to {profile_dir}', file=sys.stderr)

    times = []
    for rep in range(3):
        d = dict(data, image=data['image'] + 1e-6 * (rep + 1))
        _ = float(jnp.sum(d['image']))  # settle the input transfer
        t0 = time.perf_counter()
        loss = run_iters(d, iters) / iters
        times.append(time.perf_counter() - t0)

    dt = sorted(times)[len(times) // 2]
    its = iters / dt
    peak = ''
    try:
        from yolact_tpu.utils.tpuinfo import device_info
        stats = device_info()[0]
        if stats.get('peak_bytes_in_use'):
            # whole-process peak (params + optimizer + workspace), so the
            # /img figure amortizes constant state as batch grows; the
            # reference reports ~1.5 GB VRAM per batch element at 550^2
            # (reference README "Training" section)
            peak = (f', peak HBM {stats["peak_bytes_in_use"] / 2**30:.2f}G'
                    f' ({stats["peak_bytes_in_use"] / 2**30 / batch:.2f}G/img'
                    f' incl. constant state; reference: ~1.5G/img on GPU)')
    except Exception:
        pass
    nchunks = -(-iters // chunk)
    chunk_note = (f', chunked x{nchunks} (incl. {nchunks - 1} host fences '
                  f'— it/s is a lower bound)' if chunk < iters else '')
    print(f'train step {config_name} b{batch}@{S} {dtype}'
          f'{" s2d" if stem_s2d else ""}: {its:.2f} it/s '
          f'({its * batch:.1f} img/s), median of {len(times)}, '
          f'loss avg {loss:.1f}{chunk_note}{peak}')


if __name__ == '__main__':
    main()
