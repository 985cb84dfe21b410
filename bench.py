"""Benchmark: yolact_base full inference pipeline on one TPU chip.

Measures end-to-end frames/sec at 550x550 — device preprocess + backbone +
FPN + protonet + heads + softmax + fast-NMS + Pallas mask assembly — the
same scope the reference times in ``eval.py --benchmark`` minus host image
decode.

Methodology note: this host reaches the TPU through a relay that pipelines
and can coalesce identical async dispatches, so naive enqueue-N-then-block
timing over-reports wildly.  The loop below chains each iteration's input on
the previous iteration's output (one scalar folded into one pixel), forcing
N genuinely serial executions on device, and blocks once at the end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published Titan Xp fps for the benched config
(README.md:70-80) — 33.5 for the default yolact_base.
"""

import json
import sys
import time
from functools import partial

import numpy as np

import yolact_tpu.utils.jax_setup  # noqa: F401  persistent compile cache


def _sparsify_conf(variables, cfg):
    """Bias the random conf heads toward background so candidate counts
    look like a TRAINED model's (a handful of priors past conf_thresh,
    not thousands).

    The reference benchmarks trained weights (eval.py --benchmark), whose
    score maps are background-dominated.  Uniform-random weights instead
    push >1024 priors past conf_thresh, flipping detect()'s exactness
    cond (detect/detection.py:184-217) onto the unpruned full-sort
    fallback — a code path real checkpoints essentially never take — and
    under-reporting darknet53 by ~2x.  All NMS work is fixed-shape, so
    this only selects the representative branch; BENCH_DENSE_SCORES=1
    restores raw random weights (measures the fallback path)."""
    import jax.tree_util as jtu

    def fix(path, x):
        keys = [getattr(p, 'key', '') for p in path]
        if 'conf_layer' in keys and keys[-1] == 'bias':
            b = x.reshape(-1, cfg.num_classes)
            b = b.at[:, 0].add(8.0).at[:, 1:].add(-8.0)
            return b.reshape(x.shape)
        return x

    return jtu.tree_map_with_path(fix, variables)


def main():
    import threading

    import jax

    # fail fast instead of hanging forever when the remote-TPU relay is
    # unreachable (jax.devices() blocks indefinitely in the claim leg —
    # observed on this rig; see __graft_entry__.dryrun_multichip)
    probe = {'n': None}

    def _probe():
        try:
            probe['n'] = len(jax.devices())
        except Exception:
            probe['n'] = 0

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=180.0)
    if probe['n'] is None:
        print('bench.py: device probe timed out — accelerator platform '
              'unreachable; aborting instead of hanging', file=sys.stderr)
        sys.exit(1)

    import jax.numpy as jnp

    from yolact_tpu.config import get_config
    from yolact_tpu.infer import forward_and_detect, random_variables
    from yolact_tpu.models.yolact import Yolact

    import os
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'bfloat16'
    config_name = os.environ.get('BENCH_CONFIG', 'yolact_base')
    profile_dir = os.environ.get('BENCH_PROFILE_DIR')

    from yolact_tpu.infer import maybe_enable_stem_s2d
    cfg = maybe_enable_stem_s2d(get_config(config_name).copy(
        compute_dtype=dtype))
    model = Yolact(cfg)
    variables = random_variables(cfg)
    if not os.environ.get('BENCH_DENSE_SCORES'):
        variables = _sparsify_conf(variables, cfg)
    maskiou_vars = None
    if cfg.use_maskiou:
        # yolact_plus rescoring is part of the timed pipeline, like the
        # reference's eval path (output_utils.py:79-88)
        from yolact_tpu.models.yolact import MaskIoUHead
        Hp = 2 * (cfg.max_size // 4)
        maskiou_vars = MaskIoUHead(cfg).init(
            jax.random.PRNGKey(1), jnp.zeros((1, Hp, Hp, 1), jnp.float32))

    unroll = int(os.environ.get('BENCH_UNROLL', '1'))
    # BENCH_STREAMS=k interleaves k independent serial chains in the loop
    # body: each stream's next input depends only on its own previous
    # output, so XLA overlaps stream j's drain/fill bubble with stream
    # j+1's compute — steady-state *throughput* (k concurrent videos),
    # vs the default k=1 conservative per-frame-latency chain (the
    # reference pays a per-frame torch.cuda.synchronize, eval.py:153-171).
    streams = int(os.environ.get('BENCH_STREAMS', '1'))

    @partial(jax.jit, static_argnums=(1,) if unroll > 1 else ())
    def chained(images, n):
        # `images` is a tuple of k independent [B, H, W, 3] arrays — kept
        # as separate SSA values (not one stacked array row-scattered in
        # place) so stream independence is structural, not something the
        # scatter simplifier has to prove
        def body(_, carry):
            imgs_k, acc = carry
            new_imgs = []
            for img in imgs_k:
                out = forward_and_detect(cfg, model, variables, img,
                                         maskiou_variables=maskiou_vars)
                # consume every output so XLA cannot dead-code-eliminate
                # the mask-assembly (or any other) stage
                s = (jnp.sum(out.scores) + jnp.sum(out.masks) * 1e-3 +
                     jnp.sum(out.boxes) +
                     jnp.sum(out.classes + out.valid)) * 1e-6
                # serial dependency: fold the result into one input pixel
                new_imgs.append(img.at[0, 0, 0, 0].add(s))
                acc = acc + s
            return tuple(new_imgs), acc
        _, acc = jax.lax.fori_loop(0, n, body, (images, 0.0),
                                   unroll=unroll if unroll > 1 else None)
        return acc

    rng = np.random.RandomState(0)
    imgs = tuple(
        jnp.asarray(rng.randint(0, 256, (batch, cfg.max_size,
                                         cfg.max_size, 3))
                    .astype(np.float32))
        for _ in range(streams))

    t0 = time.perf_counter()
    # with a static trip count (unroll>1) the warmup must use the same n
    # as the timed call or the timed call recompiles
    _ = float(chained(imgs, iters if unroll > 1 else 2))
    print(f'# compile+warmup: {time.perf_counter() - t0:.1f}s',
          file=sys.stderr)

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            # under a static trip count, reuse the warmed-up n — any other
            # n would recompile inside the trace; perturb the input so the
            # relay cannot coalesce this with the warmup dispatch
            jax.block_until_ready(chained(
                tuple(im + 1e-6 for im in imgs),
                iters if unroll > 1 else 3))
        print(f'# profile written to {profile_dir}', file=sys.stderr)

    # fetching the scalar is the completion fence: through the TPU relay,
    # block_until_ready has been observed returning before remote
    # execution finishes on large donated pytrees (scripts/bench_train.py
    # hit this); float() always round-trips.  The input is perturbed so
    # no dispatch is byte-identical to the warmup/profile ones (the relay
    # dedups identical async dispatches — with BENCH_UNROLL>1 the trip
    # count is static, so an unperturbed timed call would otherwise be
    # the exact same executable + args as the warmup).
    imgs2 = tuple(im + 2e-6 for im in imgs)
    _ = float(sum(jnp.sum(im) for im in imgs2))  # settle the perturbation
    t0 = time.perf_counter()
    _ = float(chained(imgs2, iters))
    dt = (time.perf_counter() - t0) / iters

    fps = batch * streams / dt
    # reference Titan Xp fps per released config (README.md:70-80);
    # unlisted configs fall back to the yolact_base headline number.
    # Keyed on the resolved config's canonical name, not the raw
    # BENCH_CONFIG string (get_config also accepts '_config'-suffixed
    # names, which must not fall through to the default baseline).
    ref_fps = {
        'yolact_base': 33.5, 'yolact_im700': 23.6,
        'yolact_resnet50': 42.5, 'yolact_darknet53': 40.0,
        'yolact_plus_base': 27.3, 'yolact_plus_resnet50': 33.5,
    }.get(cfg.name, 33.5)
    stream_tag = f'_s{streams}' if streams > 1 else ''
    print(json.dumps({
        'metric': f'{cfg.name}_{cfg.max_size}_e2e_fps_b{batch}'
                  f'{stream_tag}_{dtype}',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / ref_fps, 3),
    }))


if __name__ == '__main__':
    main()
