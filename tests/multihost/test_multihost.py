"""Launch a 2-process jax.distributed CPU cluster and step a cross-process
sharded env batch (the real multi-host code path, SURVEY.md §2.3 D2)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.skipif(os.environ.get('GPRT_SKIP_MULTIHOST') == '1', reason='disabled')
def test_two_process_mesh():
    worker = Path(__file__).parent / 'worker.py'
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env.pop('JAX_PLATFORMS', None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f'worker failed: {err[-1500:]}'
        assert 'OK' in out
