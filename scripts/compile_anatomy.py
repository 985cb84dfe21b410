"""Where do the pathological yolact_plus compile times go?

Round-3 measured 1357 s compile+warmup for plus_base b1 (one A/B leg ~23
minutes), throttling every DCN experiment.  This script splits the cost:

  trace+lower   jax.jit(f).lower(...)    — local Python/JAX tracing + HLO gen
  compile       lowered.compile()        — XLA compile; on the axon platform
                                           this goes through the relay's
                                           remote_compile (HTTP), so it
                                           bundles local-RPC + server XLA
  cpu-compile   same graph compiled by local CPU XLA — a floor for "what
                does XLA itself charge for this graph shape" (different
                backend, but the scaling with graph size is comparable)

Run twice to see the persistent-cache hit path.  Usage:

    python scripts/compile_anatomy.py [config=yolact_plus_base] [batch=1] \
        [dtype=bfloat16] [nocache]

`nocache` disables the persistent compile cache for this process so the
compile number is a true cold compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

NOCACHE = 'nocache' in sys.argv[1:]
ARGS = [a for a in sys.argv[1:] if a != 'nocache']

if not NOCACHE:  # nocache: skip jax_setup so no persistent cache is wired
    import yolact_tpu.utils.jax_setup  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from yolact_tpu.config import get_config
    from yolact_tpu.infer import forward_and_detect, random_variables
    from yolact_tpu.models.yolact import MaskIoUHead, Yolact

    config_name = ARGS[0] if len(ARGS) > 0 else 'yolact_plus_base'
    batch = int(ARGS[1]) if len(ARGS) > 1 else 1
    dtype = ARGS[2] if len(ARGS) > 2 else 'bfloat16'

    cfg = get_config(config_name).copy(compute_dtype=dtype)
    model = Yolact(cfg)
    variables = random_variables(cfg)
    maskiou_vars = None
    if cfg.use_maskiou:
        Hp = 2 * (cfg.max_size // 4)
        maskiou_vars = MaskIoUHead(cfg).init(
            jax.random.PRNGKey(1), jnp.zeros((1, Hp, Hp, 1), jnp.float32))

    def fwd(img):
        out = forward_and_detect(cfg, model, variables, img,
                                 maskiou_variables=maskiou_vars)
        return (jnp.sum(out.scores) + jnp.sum(out.masks) +
                jnp.sum(out.boxes))

    img = jnp.zeros((batch, cfg.max_size, cfg.max_size, 3), jnp.float32)

    dev = jax.devices()[0]
    print(f'config={config_name} b{batch} {dtype} platform={dev.platform} '
          f'({dev.device_kind})  cache={"off" if NOCACHE else "on"}')

    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(img)
    t_lower = time.perf_counter() - t0
    hlo_text = lowered.as_text()
    n_lines = hlo_text.count('\n')
    print(f'  trace+lower: {t_lower:8.1f} s   (StableHLO ~{n_lines} lines, '
          f'{len(hlo_text) / 1e6:.1f} MB)')

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f'  compile:     {t_compile:8.1f} s')
    try:
        mem = compiled.memory_analysis()
        print(f'  exec HBM:    temp {mem.temp_size_in_bytes / 2**20:.0f} MB, '
              f'args {mem.argument_size_in_bytes / 2**20:.0f} MB')
    except Exception:
        pass

    t0 = time.perf_counter()
    r = compiled(img)
    _ = float(r)
    t_warm = time.perf_counter() - t0
    print(f'  first exec:  {t_warm:8.1f} s (includes transfers/settle)')

    # second compile of an IDENTICAL graph in-process: measures dedup/cache
    t0 = time.perf_counter()
    _ = jax.jit(fwd).lower(img).compile()
    print(f'  re-lower+compile (same process): '
          f'{time.perf_counter() - t0:8.1f} s')


if __name__ == '__main__':
    main()
