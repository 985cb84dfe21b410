"""Multi-host (multi-process) data-parallel training smoke test.

The reference has **no** multi-node story at all (SURVEY.md §2.8: its only
parallelism is single-process ``nn.DataParallel``).  This framework's
multi-host path is ``jax.distributed.initialize`` + a global 1-D mesh
(`cli/train.py --distributed`); on a TPU pod every host runs the same
program and XLA's SPMD partitioner moves gradients over ICI/DCN.

This script validates that path *without a pod*: it spawns N real OS
processes, each with its own virtual CPU devices (gloo collectives between
processes), forms the global mesh, feeds each process only its local shard
of a deterministic global batch, runs a few real `train_step`s, and checks
every process converges to the *same* final loss as a single-process run on
the same global batch.

Usage:
    python scripts/multihost_smoke.py [--nprocs 2] [--local-devices 2]
                                      [--steps 3]

Exit code 0 = losses match across all processes and vs single-process.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# worker
# --------------------------------------------------------------------------

def _tiny_config():
    from yolact_tpu import config as C
    cfg = C.get_config('yolact_base')
    return cfg.copy(
        max_size=128,
        num_classes=5,
        dataset=cfg.dataset.copy(class_names=('a', 'b', 'c', 'd')),
        backbone=cfg.backbone.copy(
            args=((1, 1, 1, 1),),
            pred_scales=((6,), (12,), (24,), (48,), (96,))),
        mask_proto_net=((8, 3, (('padding', 1),)),
                        (None, -2, ()),
                        (8, 1, ())),
        extra_head_net=((16, 3, (('padding', 1),)),),
        fpn=cfg.fpn.copy(num_features=16),
        freeze_bn=True)


def _global_batch(cfg, batch):
    import numpy as np
    S, G = cfg.max_size, 8
    rng = np.random.RandomState(0)
    xy = rng.rand(batch, G, 2).astype(np.float32) * 0.5 + 0.05
    wh = rng.rand(batch, G, 2).astype(np.float32) * 0.4 + 0.05
    return dict(
        image=rng.rand(batch, S, S, 3).astype(np.float32),
        gt_boxes=np.concatenate([xy, xy + wh], axis=-1),
        gt_labels=rng.randint(1, cfg.num_classes, (batch, G)).astype(np.int32),
        gt_masks=rng.randint(0, 2, (batch, G, S, S)).astype(np.uint8),
        num_gts=np.full(batch, G, np.int32),
        num_crowds=np.zeros(batch, np.int32))


def worker_main():
    pid = int(os.environ['MH_PROC_ID'])
    nprocs = int(os.environ['MH_NPROCS'])
    port = os.environ['MH_PORT']
    local_devices = int(os.environ['MH_LOCAL_DEVICES'])
    steps = int(os.environ['MH_STEPS'])
    batch = int(os.environ['MH_BATCH'])
    out_path = os.environ['MH_OUT']

    # hermetic CPU platform (same recipe as tests/conftest.py — must happen
    # after `import jax` because this image's sitecustomize imports jax)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') +
        f' --xla_force_host_platform_device_count={local_devices}').strip()
    if nprocs > 1:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        jax.distributed.initialize(
            coordinator_address=f'localhost:{port}',
            num_processes=nprocs, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolact_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = _tiny_config()
    model, state = create_train_state(cfg, seed=0)

    mesh = make_mesh()  # global mesh over all processes' devices
    assert len(mesh.devices.flat) == nprocs * local_devices
    state = jax.device_put(state, replicate(mesh))
    data = shard_batch(mesh, _global_batch(cfg, batch))

    step = jax.jit(lambda st, d, key: train_step(cfg, model, st, d, key))
    losses = None
    for i in range(steps):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        state, losses = step(state, data, key)
    result = {k: float(v) for k, v in losses.items()}
    # param checksum proves the *updates* (incl. the cross-process gradient
    # all-reduce) agree, not just the loss of the last forward
    checksum = float(sum(
        jnp.sum(jnp.abs(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(state.params)))
    result['param_checksum'] = checksum
    result['process'] = pid
    result['ndev_global'] = jax.device_count()
    with open(out_path, 'w') as f:
        json.dump(result, f)
    print(f'[proc {pid}] total={result["total"]:.6f} '
          f'checksum={checksum:.6f} ndev={jax.device_count()}', flush=True)


# --------------------------------------------------------------------------
# launcher
# --------------------------------------------------------------------------

def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(env):
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, cwd=REPO, text=True)


def _communicate(p, timeout):
    """communicate() with kill-and-reap on timeout."""
    try:
        stdout, _ = p.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
        stdout = '(timeout)'
    return stdout


def launcher_main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nprocs', type=int, default=2)
    ap.add_argument('--local-devices', type=int, default=2)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--timeout', type=int, default=900)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix='mh_smoke_')
    base_env = dict(os.environ,
                    MH_NPROCS=str(args.nprocs),
                    MH_LOCAL_DEVICES=str(args.local_devices),
                    MH_STEPS=str(args.steps),
                    MH_BATCH=str(args.batch),
                    MH_PORT=str(_free_port()),
                    PYTHONPATH=REPO + os.pathsep +
                    os.environ.get('PYTHONPATH', ''))

    # 1) the distributed run: nprocs processes x local-devices each
    procs = []
    outs = []
    for i in range(args.nprocs):
        out = os.path.join(tmp, f'proc{i}.json')
        outs.append(out)
        env = dict(base_env, MH_PROC_ID=str(i), MH_OUT=out)
        procs.append(_spawn(env))
    rc = 0
    for i, p in enumerate(procs):
        stdout = _communicate(p, args.timeout)
        if p.returncode != 0:
            print(f'--- proc {i} FAILED (rc={p.returncode}) ---\n{stdout}')
            rc = 1
        else:
            sys.stdout.write(stdout)
    if rc:
        return rc

    # 2) the single-process control on the same *global* batch and devices
    ctrl = os.path.join(tmp, 'single.json')
    env = dict(base_env, MH_PROC_ID='0', MH_NPROCS='1', MH_OUT=ctrl,
               MH_LOCAL_DEVICES=str(args.nprocs * args.local_devices),
               MH_PORT=str(_free_port()))
    p = _spawn(env)
    stdout = _communicate(p, args.timeout)
    sys.stdout.write(stdout)
    if p.returncode != 0:
        print(f'--- single-process control FAILED (rc={p.returncode}) ---')
        return 1

    results = [json.load(open(o)) for o in outs]
    control = json.load(open(ctrl))
    ok = True
    for r in results:
        for key in ('total', 'param_checksum'):
            rel = abs(r[key] - control[key]) / max(abs(control[key]), 1e-9)
            if rel > 1e-4:
                print(f'MISMATCH proc {r["process"]} {key}: '
                      f'{r[key]} vs single {control[key]} (rel {rel:.2e})')
                ok = False
    print('multihost smoke:', 'PASS' if ok else 'FAIL',
          f'({args.nprocs} procs x {args.local_devices} devices, '
          f'{args.steps} steps, total={control["total"]:.6f})')
    return 0 if ok else 1


if __name__ == '__main__':
    if 'MH_OUT' in os.environ:
        sys.exit(worker_main() or 0)
    sys.exit(launcher_main())
