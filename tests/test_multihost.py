"""Multi-process (multi-host) data-parallel smoke test.

Spawns real OS processes with gloo CPU collectives via
``scripts/multihost_smoke.py`` and checks the distributed train step
matches a single-process run on the same global batch.  This exercises the
actual ``jax.distributed.initialize`` + global-mesh path behind
``cli/train.py --distributed`` — a capability the reference lacks entirely
(its only parallelism is single-process ``nn.DataParallel``,
``train.py:149-170``).

Slow on a 1-CPU host (each subprocess compiles the tiny model from
scratch); marked ``slow`` so it can be deselected with ``-m 'not slow'``.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'multihost_smoke.py')


@pytest.mark.slow
def test_multihost_smoke_two_processes():
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)  # workers set their own device counts
    # the launcher bounds each child at --timeout and kills/reaps on
    # expiry; worst case here is ~3x500s sequential waits, within the
    # outer 1800s so pytest never has to TimeoutExpired (which would
    # orphan the worker grandchildren)
    res = subprocess.run(
        [sys.executable, SCRIPT, '--nprocs', '2', '--local-devices', '2',
         '--steps', '2', '--timeout', '500'],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, \
        f'stdout:\n{res.stdout}\nstderr:\n{res.stderr[-2000:]}'
    assert 'PASS' in res.stdout
