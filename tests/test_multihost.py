"""DCN multi-host offline map building (SURVEY §5, VERDICT r4 task 8):
the two-process jax.distributed CPU dryrun must pass — lanes shard over
a global mesh spanning both processes, the hot loop is collective-free,
and the end-of-run trajectory all-gather delivers every lane to every
host with cross-host determinism (see parallel/multihost.py and
tools/dryrun_dcn.py)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dcn_dryrun():
    env = dict(os.environ)
    # The workers pin their own platform/devices; strip this process's
    # virtual-mesh flags so they don't leak.
    env.pop("XLA_FLAGS", None)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_dcn.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert rc.returncode == 0, rc.stderr
    report = json.loads(rc.stdout.strip().splitlines()[-1])
    assert report["ok"]
    assert report["processes"] == 2
    assert report["global_devices"] == 4
    assert report["lanes"] == 4
