"""Benchmark: yolact_base full inference pipeline on one TPU chip.

Measures end-to-end frames/sec at 550x550 — device preprocess + backbone +
FPN + protonet + heads + softmax + fast-NMS + prototype mask assembly, all
in one jitted program (the same scope the reference times in
``eval.py --benchmark``, minus host-side image decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 33.5 fps for yolact_base on a Titan Xp (README.md:72).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yolact_tpu.config import get_config
    from yolact_tpu.infer import Pipeline, random_variables

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'bfloat16'

    cfg = get_config('yolact_base').copy(compute_dtype=dtype)
    variables = random_variables(cfg)
    pipe = Pipeline(cfg, variables)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (batch, cfg.max_size, cfg.max_size, 3)
                       ).astype(np.float32)
    imgs = jnp.asarray(imgs)

    # warmup / compile
    out = pipe(imgs)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        'metric': f'yolact_base_550_fps_b{batch}_{dtype}',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / 33.5, 3),
    }))


if __name__ == '__main__':
    main()
