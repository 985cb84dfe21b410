"""Bisect the 'TPU worker process crashed or restarted' fault in the
yolact_plus TRAIN path (seen twice: results/remeasure_r3.txt and
results/plus_train_r4.txt, both mid-execution of the jitted plus train
step — compile succeeded, execution killed the worker).

HISTORICAL TOOL — the fault is FIXED (round 5): it was the block
gather's serial scatter transpose making dispatches outlast the relay
watchdog, resolved by the custom VJP in kernels/dcn.py.  These stages
now exercise the FIXED backward, so they no longer reproduce the crash
(that is the point); NOTES.md "plus-train crash: root cause (round 5)"
has the full story and probe_dcn_bwd.py is the live successor.

Stages (argv[1]):
  dcn       single deform_conv2d value_and_grad, chained on-chip loop,
            at each real plus_resnet50 stage shape (prime suspect: the
            autodiff scatter-add of the PROMISE_IN_BOUNDS corner gather)
  dcnoob    same but with LARGE random offsets (far out of bounds) so the
            clip/valid paths and the scatter hit edge indices hard
  backbone  full plus_resnet50 backbone fwd+bwd (13 DCN layers)
  loss      full train_step forward+backward, batch 8, like bench_train
            but iters=3 (the crashing configuration)

Usage: python scripts/probe_plus_train_crash.py <stage> [batch] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import yolact_tpu.utils.jax_setup  # noqa: E402,F401


def fence(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def chained_grad(fn, args, iters):
    """Run fn (returns scalar) iters times with a serial dependency.

    ROUND-5 FIX: the original carry multiplied the gradient by 0, so XLA
    dead-code-eliminated the entire backward pass — the round-4 'bare
    DCN grad passes at all stage shapes' cells actually measured
    forward-only.  The grad is now folded into the carry unscaled-dead
    -code-proof (elementwise, 1e-12 weight) so the backward executes."""
    import jax

    @jax.jit
    def run(args, n):
        def body(i, carry):
            a, acc = carry
            val, grads = jax.value_and_grad(fn)(a[0], *a[1:])
            g0 = jax.tree_util.tree_leaves(grads)[0]
            a = (a[0] + 1e-9 * val + 1e-12 * g0,) + a[1:]
            return a, acc + val
        a, acc = jax.lax.fori_loop(0, n, body, (args, 0.0))
        return acc
    return run(args, iters)


def stage_dcn(batch, iters, oob=False, dtype='float32'):
    import jax.numpy as jnp
    from yolact_tpu.kernels.dcn import deform_conv2d

    rng = np.random.RandomState(0)
    dt = jnp.dtype(dtype)
    # plus_resnet50 DCN stage shapes (H, W, Cin->Cout of the 3x3 conv2)
    shapes = [(69, 128), (35, 256), (18, 512)]
    for H, C in shapes:
        K = 3
        # dtype placement mirrors DCNLayer: x/mask/weight in compute dtype,
        # offsets f32 (resnet.py:65-68)
        x = jnp.asarray(rng.randn(batch, H, H, C).astype(np.float32)).astype(dt)
        scale = 40.0 if oob else 2.0
        off = jnp.asarray(
            (rng.randn(batch, H, H, 2 * K * K) * scale).astype(np.float32))
        m = jnp.asarray(rng.rand(batch, H, H, K * K).astype(np.float32)).astype(dt)
        w = jnp.asarray(
            (rng.randn(K, K, C, C) * 0.05).astype(np.float32)).astype(dt)

        def f(x, off, m, w):
            return jnp.sum(deform_conv2d(x, off, m, w) ** 2) * 1e-6

        t0 = time.perf_counter()
        acc = chained_grad(f, (x, off, m, w), iters)
        v = float(acc)
        print(f'  dcn{"-oob" if oob else ""} {dtype} b{batch} {H}x{H}x{C}: OK '
              f'acc={v:.4g}  {time.perf_counter() - t0:.1f}s', flush=True)


def stage_backbone(batch, iters, dtype='float32'):
    import jax
    import jax.numpy as jnp
    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import Yolact

    cfg = get_config('yolact_plus_resnet50').copy(compute_dtype=dtype)
    model = Yolact(cfg)
    x = jnp.zeros((batch, cfg.max_size, cfg.max_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=True)

    def f(params, x):
        preds, _ = model.apply({'params': params,
                                'batch_stats': variables['batch_stats']},
                               x, train=True, mutable=['batch_stats'])
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) * 1e-9
                   for v in jax.tree_util.tree_leaves(preds))

    @jax.jit
    def run(params, x, n):
        def body(i, carry):
            x, acc = carry
            val, g = jax.value_and_grad(f, argnums=1)(params, x)
            return x + 1e-9 * val, acc + val
        _, acc = jax.lax.fori_loop(0, n, body, (x, 0.0))
        return acc

    t0 = time.perf_counter()
    acc = run(variables['params'], x, iters)
    print(f'  backbone+heads fwd+bwd b{batch}: OK acc={float(acc):.4g}  '
          f'{time.perf_counter() - t0:.1f}s', flush=True)


def stage_loss(batch, iters):
    os.environ['BENCH_TRAIN_CONFIG'] = os.environ.get(
        'BENCH_TRAIN_CONFIG', 'yolact_plus_resnet50')
    sys.argv = ['bench_train.py', str(batch), str(iters), 'float32']
    import importlib
    bt = importlib.import_module('scripts.bench_train')
    bt.main()


def stage_bbparams(batch, iters, dtype='float32'):
    """Full plus model fwd+bwd like stage_backbone, but grads wrt PARAMS
    (the backbone stage only took grads wrt the input)."""
    import jax
    import jax.numpy as jnp
    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import Yolact

    cfg = get_config('yolact_plus_resnet50').copy(compute_dtype=dtype)
    model = Yolact(cfg)
    x = jnp.zeros((batch, cfg.max_size, cfg.max_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=True)

    def f(params, x):
        preds, _ = model.apply({'params': params,
                                'batch_stats': variables['batch_stats']},
                               x, train=True, mutable=['batch_stats'])
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) * 1e-9
                   for v in jax.tree_util.tree_leaves(preds))

    @jax.jit
    def run(params, x, n):
        def body(i, carry):
            params, acc = carry
            val, g = jax.value_and_grad(f)(params, x)
            params = jax.tree.map(lambda p, gg: p - 0.0 * gg, params, g)
            return params, acc + val
        _, acc = jax.lax.fori_loop(0, n, body, (params, 0.0))
        return acc

    t0 = time.perf_counter()
    acc = run(variables['params'], x, iters)
    print(f'  full-model PARAM grads b{batch}: OK acc={float(acc):.4g}  '
          f'{time.perf_counter() - t0:.1f}s', flush=True)


def stage_loss_variants(batch, iters, maskiou, grad, update,
                        dtype='float32'):
    """train_step replica with toggles: maskiou on/off, grad on/off,
    optimizer update on/off."""
    import jax
    import jax.numpy as jnp
    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import MaskIoUHead, Yolact
    from yolact_tpu.train.loss import multibox_loss
    from yolact_tpu.train.step import create_train_state

    name = os.environ.get('BENCH_TRAIN_CONFIG', 'yolact_plus_resnet50')
    cfg = get_config(name).copy(compute_dtype=dtype)
    if not maskiou:
        cfg = cfg.copy(use_maskiou=False, maskiou_net=())
    model, state = create_train_state(cfg, seed=0)

    S, G = cfg.max_size, 32
    rng = np.random.RandomState(0)
    import numpy as _np
    xy = rng.rand(1, G, 2).astype(_np.float32) * 0.5 + 0.05
    data = dict(
        image=jnp.asarray(rng.rand(batch, S, S, 3).astype(_np.float32)),
        gt_boxes=jnp.asarray(_np.tile(_np.concatenate(
            [xy, xy + rng.rand(1, G, 2).astype(_np.float32) * 0.4 + 0.05],
            axis=-1), (batch, 1, 1))),
        gt_labels=jnp.asarray(
            rng.randint(1, cfg.num_classes, (batch, G)).astype(_np.int32)),
        gt_masks=jnp.asarray(
            rng.randint(0, 2, (batch, G, S, S)).astype(_np.uint8)),
        num_gts=jnp.full(batch, G - 1, jnp.int32),
        num_crowds=jnp.ones(batch, jnp.int32))
    from yolact_tpu.config import MaskType
    if cfg.mask_type == MaskType.LINCOMB and \
            cfg.mask_proto_binarize_downsampled_gt:
        from yolact_tpu.ops.anchors import proto_size, seg_size
        from yolact_tpu.ops.bits import pack_bits_last
        from yolact_tpu.ops.resize import resize_bilinear_torch_np
        soft = _np.asarray(data.pop('gt_masks')).astype(_np.float32)
        data['gt_masks_proto_packed'] = jnp.asarray(pack_bits_last(
            resize_bilinear_torch_np(soft, proto_size(cfg)) > 0.5))
        if cfg.use_semantic_segmentation_loss:
            data['gt_masks_seg_packed'] = jnp.asarray(pack_bits_last(
                resize_bilinear_torch_np(soft, seg_size(cfg)) > 0.5))

    maskiou_model = MaskIoUHead(cfg) if cfg.use_maskiou else None

    def loss_fn(params, batch_d, rng_key):
        preds, _ = model.apply(
            {'params': params['model'], 'batch_stats': state.batch_stats},
            batch_d['image'], train=True, mutable=['batch_stats'])
        mi = None
        if maskiou_model is not None:
            mi = lambda m: maskiou_model.apply(
                {'params': params['maskiou']}, m)
        losses, _ = multibox_loss(cfg, rng_key, preds, batch_d,
                                  maskiou_apply=mi, conf_state=None)
        return sum(losses.values())

    @jax.jit
    def run(state, data, n):
        def body(i, carry):
            st, d, acc = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            if grad:
                total, grads = jax.value_and_grad(loss_fn)(
                    st.params, d, key)
                if update:
                    upd, new_opt = st.tx.update(grads, st.opt_state,
                                                st.params)
                    import optax
                    new_params = optax.apply_updates(
                        st.params, jax.tree.map(lambda u: 1e-5 * u, upd))
                    st = st.replace(params=new_params, opt_state=new_opt)
            else:
                total = loss_fn(st.params, d, key)
            d = dict(d, image=d['image'].at[0, 0, 0, 0].add(total * 1e-9))
            return st, d, acc + total
        st, _, acc = jax.lax.fori_loop(0, n, body, (state, data, 0.0))
        return acc

    t0 = time.perf_counter()
    acc = run(state, data, iters)
    print(f'  loss-variant maskiou={maskiou} grad={grad} update={update} '
          f'b{batch}: OK acc={float(acc):.4g}  '
          f'{time.perf_counter() - t0:.1f}s', flush=True)


def _synth_data(cfg, batch):
    import jax.numpy as jnp
    S, G = cfg.max_size, 32
    rng = np.random.RandomState(0)
    xy = rng.rand(1, G, 2).astype(np.float32) * 0.5 + 0.05
    data = dict(
        image=jnp.asarray(rng.rand(batch, S, S, 3).astype(np.float32)),
        gt_boxes=jnp.asarray(np.tile(np.concatenate(
            [xy, xy + rng.rand(1, G, 2).astype(np.float32) * 0.4 + 0.05],
            axis=-1), (batch, 1, 1))),
        gt_labels=jnp.asarray(
            rng.randint(1, cfg.num_classes, (batch, G)).astype(np.int32)),
        gt_masks=jnp.asarray(
            rng.randint(0, 2, (batch, G, S, S)).astype(np.uint8)),
        num_gts=jnp.full(batch, G - 1, jnp.int32),
        num_crowds=jnp.ones(batch, jnp.int32))
    from yolact_tpu.config import MaskType
    if cfg.mask_type == MaskType.LINCOMB and \
            cfg.mask_proto_binarize_downsampled_gt:
        from yolact_tpu.ops.anchors import proto_size, seg_size
        from yolact_tpu.ops.bits import pack_bits_last
        from yolact_tpu.ops.resize import resize_bilinear_torch_np
        soft = np.asarray(data.pop('gt_masks')).astype(np.float32)
        data['gt_masks_proto_packed'] = jnp.asarray(pack_bits_last(
            resize_bilinear_torch_np(soft, proto_size(cfg)) > 0.5))
        if cfg.use_semantic_segmentation_loss:
            data['gt_masks_seg_packed'] = jnp.asarray(pack_bits_last(
                resize_bilinear_torch_np(soft, seg_size(cfg)) > 0.5))
    return data


def stage_step(batch, iters, features):
    """Replicate train/step.py:train_step exactly, with its distinguishing
    features individually toggleable.  (Round-4 pass/crash claims for the
    lossall/step stages lived only in /tmp/bisect.log, which was lost to a
    host reprovision — treat them as unverified.  Round 5 made the whole
    question moot: the crash was dispatch DURATION, not any feature —
    NOTES.md "plus-train crash: root cause (round 5)".)  Features:

      guard     isfinite-all-leaves reduction + where() zeroing of grads
      rollback  final tree.map(where) rollback over the WHOLE new state
      bn        carry updated batch_stats into the next iteration
      lr        learning_rate(cfg, step) schedule (vs constant 1e-5)

    features: comma-separated subset, or 'all' / 'none'.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import MaskIoUHead
    from yolact_tpu.train.loss import multibox_loss
    from yolact_tpu.train.schedule import learning_rate
    from yolact_tpu.train.step import create_train_state

    feats = (set('guard,rollback,bn,lr'.split(','))
             if features == 'all' else
             set() if features == 'none' else set(features.split(',')))
    name = os.environ.get('BENCH_TRAIN_CONFIG', 'yolact_plus_resnet50')
    cfg = get_config(name).copy(compute_dtype='float32')
    model, state = create_train_state(cfg, seed=0)
    data = _synth_data(cfg, batch)
    maskiou_model = MaskIoUHead(cfg) if cfg.use_maskiou else None

    def step(st, batch_d, rng):
        def loss_fn(params):
            preds, new_ms = model.apply(
                {'params': params['model'], 'batch_stats': st.batch_stats},
                batch_d['image'], train=True, mutable=['batch_stats'])
            mi = None
            if maskiou_model is not None:
                mi = lambda m: maskiou_model.apply(
                    {'params': params['maskiou']}, m)
            losses, _ = multibox_loss(cfg, rng, preds, batch_d,
                                      maskiou_apply=mi, conf_state=None)
            return sum(losses.values()), new_ms['batch_stats']

        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        finite = jnp.isfinite(total)
        if 'guard' in feats:
            gf = jnp.array(True)
            for g in jax.tree_util.tree_leaves(grads):
                gf &= jnp.all(jnp.isfinite(g))
            finite = finite & gf
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
        lr = (learning_rate(cfg, st.step) if 'lr' in feats
              else jnp.asarray(1e-5, jnp.float32))
        updates = jax.tree.map(lambda u: lr * u, updates)
        new_state = st.replace(step=st.step + 1,
                               params=optax.apply_updates(st.params, updates),
                               opt_state=new_opt)
        if 'bn' in feats:
            new_state = new_state.replace(batch_stats=new_stats)
        if 'rollback' in feats:
            new_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                new_state, st.replace(step=new_state.step))
        return new_state, total

    @jax.jit
    def run(state, data, n):
        def body(i, carry):
            st, d, acc = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            st, total = step(st, d, key)
            d = dict(d, image=d['image'].at[0, 0, 0, 0].add(total * 1e-9))
            return st, d, acc + total
        st, _, acc = jax.lax.fori_loop(0, n, body, (state, data, 0.0))
        return acc

    t0 = time.perf_counter()
    acc = run(state, data, iters)
    print(f'  step-variant [{",".join(sorted(feats)) or "none"}] '
          f'b{batch}: OK acc={float(acc):.4g}  '
          f'{time.perf_counter() - t0:.1f}s', flush=True)


def stage_realstep(batch, iters, dtype='float32'):
    """The REAL train/step.py:train_step in the same chained harness as
    bench_train.  Crashes at iters>=20 pre-remat (dispatch duration —
    see NOTES.md); probe_dcn_bwd.py's sweep stage is the bounded
    successor of this stage."""
    import jax
    import jax.numpy as jnp
    from yolact_tpu.config import get_config
    from yolact_tpu.train.step import create_train_state, train_step

    name = os.environ.get('BENCH_TRAIN_CONFIG', 'yolact_plus_resnet50')
    cfg = get_config(name).copy(compute_dtype=dtype)
    model, state = create_train_state(cfg, seed=0)
    data = _synth_data(cfg, batch)

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

    t0 = time.perf_counter()
    st, acc = chained(state, data, iters)
    print(f'  realstep {dtype} b{batch}: OK acc={float(acc):.4g}  '
          f'{time.perf_counter() - t0:.1f}s', flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else 'dcn'
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f'== probe_plus_train_crash {stage} b{batch} i{iters} '
          f'{time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())} ==',
          flush=True)
    dtype = sys.argv[4] if len(sys.argv) > 4 else 'float32'
    if stage == 'dcn':
        stage_dcn(batch, iters, dtype=dtype)
    elif stage == 'dcnoob':
        stage_dcn(batch, iters, oob=True, dtype=dtype)
    elif stage == 'backbone':
        stage_backbone(batch, iters, dtype=dtype)
    elif stage == 'loss':
        stage_loss(batch, iters)
    elif stage == 'bbparams':
        stage_bbparams(batch, iters, dtype=dtype)
    elif stage == 'lossng':     # loss value only, no grad
        stage_loss_variants(batch, iters, maskiou=True, grad=False,
                            update=False, dtype=dtype)
    elif stage == 'lossnm':     # full grad+update, maskiou OFF
        stage_loss_variants(batch, iters, maskiou=False, grad=True,
                            update=True, dtype=dtype)
    elif stage == 'lossnu':     # grad but no optimizer update
        stage_loss_variants(batch, iters, maskiou=True, grad=True,
                            update=False, dtype=dtype)
    elif stage == 'lossall':    # grad + update + maskiou (≈ bench_train)
        stage_loss_variants(batch, iters, maskiou=True, grad=True,
                            update=True, dtype=dtype)
    elif stage == 'step':       # real-train_step replica, toggleable
        stage_step(batch, iters,
                   sys.argv[4] if len(sys.argv) > 4 else 'all')
    elif stage == 'realstep':   # the actual train_step, probe harness
        stage_realstep(batch, iters,
                       sys.argv[4] if len(sys.argv) > 4 else 'float32')
    else:
        raise SystemExit(f'unknown stage {stage}')
    print('PROBE DONE', flush=True)


if __name__ == '__main__':
    main()
