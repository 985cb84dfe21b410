"""Round-5 probe: is the plus-train worker crash a *duration* problem
caused by a pathologically slow DCN backward?

Timeline evidence (NOTES.md "plus-train crash"): the crash first appeared
in remeasure_r3 — immediately AFTER the round-3 DCN gather rework — while
the round-2 formulation (4 per-corner ``take_along_axis`` row gathers)
trained the full plus config at 3.6 it/s.  The round-3 form is ONE flat
[2,2,C]-block ``lax.gather`` with explicit batch indices; its autodiff
transpose is a scatter-add of [2,2,C] blocks with duplicate indices, which
XLA:TPU may expand to a *serial* per-update loop.  r4c timing is
consistent: a SINGLE DCN layer value_and_grad ran ~0.6-0.7 s/iter warm at
35x35x256 (results/plus_train_r4c.txt: 6.8s for i10), so the 13-DCN-layer
full step would take tens of seconds per iteration and the default i20
chained dispatch becomes a >5 min single execution — long enough to trip
the relay/worker watchdog ("TPU worker process crashed or restarted").

Stages (argv[1]):
  ab        per-shape A/B at each plus stage shape: fwd-only, grad through
            the CURRENT block-gather form, grad through the ROUND-2 row
            (take_along_axis) form.  Reports warm s/iter for each.
  memanal   lower+compile the real plus train step (chained, like
            bench_train) and print compiled memory_analysis WITHOUT
            executing — zero crash risk.
  sweep     realstep with a hot compile: run i1, fence, then i2, i4 —
            the fori_loop trip count is traced, so all reuse one
            executable; reports measured s/iter of the REAL train step.

Usage: python scripts/probe_dcn_bwd.py <stage> [batch] [iters] [dtype]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import yolact_tpu.utils.jax_setup  # noqa: E402,F401


# The row-gather sampler lives in production code
# (yolact_tpu.kernels.dcn._bilinear_gather_rows — kept there as the
# autodiff reference for the hand-written custom VJP); the probe builds
# its formulation variants through deform_conv2d's gather_impl parameter
# instead of carrying copies.
def deform_conv2d_rows(x, offset, mask, weight, bias=None,
                       stride=1, padding=1, dilation=1):
    """deform_conv2d with the round-2 row-gather core (probe-only)."""
    from yolact_tpu.kernels.dcn import _bilinear_gather_rows, deform_conv2d
    return deform_conv2d(x, offset, mask, weight, bias, stride, padding,
                         dilation, gather_impl=_bilinear_gather_rows)


def _chained(fn, grad):
    """Serial-dependency loop; trip count traced (one compile per fn).

    The gradient must be CONSUMED or XLA dead-code-eliminates the whole
    backward pass (round-5 code review caught the first version of this
    probe doing exactly that — every vjp row had measured forward-only;
    the same bug invalidates probe_plus_train_crash.chained_grad's 'bare
    DCN grad' round-4 cells).  Here the grad of the FIRST argument (x —
    the input scatter-add path, the expensive transpose) is folded into
    the loop carry, so the backward genuinely executes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args, n):
        def body(i, carry):
            a, acc = carry
            if grad:
                val, g = jax.value_and_grad(fn)(a[0], *a[1:])
                # fold the full grad tensor into the carry: the scatter
                # output is consumed elementwise, nothing can be DCE'd
                a = (a[0] + 1e-9 * val + 1e-12 * g,) + a[1:]
            else:
                val = fn(*a)
                a = (a[0] + 1e-9 * val,) + a[1:]
            return a, acc + val
        a, acc = jax.lax.fori_loop(0, n, body, (args, 0.0))
        return acc
    return run


def stage_ab(batch, iters, dtype='float32'):
    import jax.numpy as jnp
    from yolact_tpu.kernels.dcn import (_bilinear_gather_block,
                                        deform_conv2d)

    rng = np.random.RandomState(0)
    dt = jnp.dtype(dtype)
    # cheapest compile first
    shapes = [(18, 512), (35, 256), (69, 128)]
    K = 3
    for H, C in shapes:
        x = jnp.asarray(rng.randn(batch, H, H, C).astype(np.float32)).astype(dt)
        off = jnp.asarray(
            (rng.randn(batch, H, H, 2 * K * K) * 2.0).astype(np.float32))
        m = jnp.asarray(rng.rand(batch, H, H, K * K).astype(np.float32)).astype(dt)
        w = jnp.asarray(
            (rng.randn(K, K, C, C) * 0.05).astype(np.float32)).astype(dt)

        # vjp-blockraw = raw autodiff of the block gather (the transpose
        # production avoids); vjp-custom = the shipped custom VJP
        # (block fwd + row bwd); vjp-rows = pure row formulation
        def deform_conv2d_blockraw(*a, **k):
            return deform_conv2d(*a, gather_impl=_bilinear_gather_block,
                                 **k)

        for name, impl, grad in (
                ('fwd-block', deform_conv2d_blockraw, False),
                ('vjp-blockraw', deform_conv2d_blockraw, True),
                ('vjp-custom', deform_conv2d, True),
                ('fwd-rows', deform_conv2d_rows, False),
                ('vjp-rows', deform_conv2d_rows, True)):
            def f(x, off, m, w, impl=impl):
                return jnp.sum(impl(x, off, m, w) ** 2) * 1e-6
            run = _chained(f, grad)
            t0 = time.perf_counter()
            v = float(run((x, off, m, w), 1))          # compile + 1 iter
            t_compile = time.perf_counter() - t0
            # two warm timed calls; perturb so the relay can't dedup
            per = []
            for rep in range(2):
                xr = x + jnp.asarray(1e-6 * (rep + 1), dt)
                _ = float(jnp.sum(xr))                 # settle transfer
                t0 = time.perf_counter()
                v = float(run((xr, off, m, w), iters))
                per.append((time.perf_counter() - t0) / iters)
            print(f'  {name} {dtype} b{batch} {H}x{H}x{C}: '
                  f'{min(per) * 1e3:.1f} ms/iter (reps '
                  f'{per[0] * 1e3:.1f}/{per[1] * 1e3:.1f}), '
                  f'compile+1 {t_compile:.1f}s, acc={v:.4g}', flush=True)


def _plus_setup(batch, dtype):
    from yolact_tpu.config import get_config
    from yolact_tpu.train.step import create_train_state
    from scripts.probe_plus_train_crash import _synth_data
    name = os.environ.get('BENCH_TRAIN_CONFIG', 'yolact_plus_resnet50')
    cfg = get_config(name).copy(compute_dtype=dtype)
    if os.environ.get('PROBE_REMAT'):           # A/B the remat policy
        cfg = cfg.copy(train_remat=os.environ['PROBE_REMAT'])
    model, state = create_train_state(cfg, seed=0)
    data = _synth_data(cfg, batch)
    return cfg, model, state, data


def _plus_chained(cfg, model):
    # Deliberately mirrors bench_train.py's chained() WITHOUT the
    # watchdog chunking: probes need one uninterrupted device dispatch
    # of a known trip count (that is the thing being measured).  If the
    # chained-dispatch methodology changes (perturbation scheme,
    # fencing), change it in bench_train.py, here, and in
    # probe_plus_train_crash.py together.
    import jax
    from yolact_tpu.train.step import train_step

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
    return chained


def stage_memanal(batch, dtype='float32'):
    cfg, model, state, data = _plus_setup(batch, dtype)
    chained = _plus_chained(cfg, model)
    t0 = time.perf_counter()
    lowered = chained.lower(state, data, 1)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f'  compile {time.perf_counter() - t0:.1f}s', flush=True)
    for k in ('argument_size_in_bytes', 'output_size_in_bytes',
              'temp_size_in_bytes', 'generated_code_size_in_bytes',
              'alias_size_in_bytes'):
        v = getattr(ma, k, None)
        if v is not None:
            print(f'  {k}: {v / 2**30:.3f} GiB' if v > 2**20 else
                  f'  {k}: {v}', flush=True)


def stage_sweep(batch, dtype='float32'):
    import jax.numpy as jnp
    cfg, model, state, data = _plus_setup(batch, dtype)
    chained = _plus_chained(cfg, model)
    t0 = time.perf_counter()
    st, acc = chained(state, data, 1)
    v = float(acc)
    print(f'  realstep i1 {dtype} b{batch}: OK acc={v:.4g}  '
          f'{time.perf_counter() - t0:.1f}s (incl compile)', flush=True)
    prev = 0.0
    for n in (1, 2, 4):
        d = dict(data, image=data['image'] + 1e-6 * (n + 1))
        _ = float(jnp.sum(d['image']))
        t0 = time.perf_counter()
        st2, acc = chained(state, d, n)
        v = float(acc)
        dt = time.perf_counter() - t0
        marg = f', marginal {(dt - prev):.1f}s' if n > 1 else ''
        print(f'  realstep i{n}: OK {dt:.1f}s = {dt / n:.1f} s/iter{marg}',
              flush=True)
        prev = dt


def stage_profile(batch, dtype='float32'):
    """Trace ONE warm chained(i2) execution of the real plus train step;
    summarize with scripts/parse_xplane.py <dir>/plugins/profile/*/*.xplane.pb"""
    import glob
    import jax
    import jax.numpy as jnp
    cfg, model, state, data = _plus_setup(batch, dtype)
    chained = _plus_chained(cfg, model)
    _, acc = chained(state, data, 1)
    print(f'  warm acc={float(acc):.4g}', flush=True)
    prof_dir = os.environ.get('PROBE_PROFILE_DIR', '/tmp/prof_plus_train')
    d = dict(data, image=data['image'] + 1e-6)
    _ = float(jnp.sum(d['image']))
    with jax.profiler.trace(prof_dir):
        _, acc = chained(state, d, 2)
        _ = float(acc)
    pbs = glob.glob(f'{prof_dir}/plugins/profile/*/*.xplane.pb')
    print(f'  profile: {pbs}', flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else 'ab'
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dtype = sys.argv[4] if len(sys.argv) > 4 else 'float32'
    print(f'== probe_dcn_bwd {stage} b{batch} i{iters} {dtype} '
          f'{time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())} ==',
          flush=True)
    if stage == 'ab':
        stage_ab(batch, iters, dtype)
    elif stage == 'memanal':
        stage_memanal(batch, dtype)
    elif stage == 'sweep':
        stage_sweep(batch, dtype)
    elif stage == 'profile':
        stage_profile(batch, dtype)
    else:
        raise SystemExit(f'unknown stage {stage}')
    print('PROBE DONE', flush=True)


if __name__ == '__main__':
    main()
