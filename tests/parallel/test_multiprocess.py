"""REAL multi-process (jax.distributed + gloo) data-parallel training:
spawns 2 separate Python processes, each sampling its own seed shard via
MultiHostNodeLoader, with gradient reduction crossing process boundaries.
Single-process virtual meshes cannot catch cross-process bugs (shard
assembly, collective alignment, epoch-synchronized shuffles) — this does."""

import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def test_two_process_training():
    r = subprocess.run(
        [sys.executable, osp.join(ROOT, "scripts", "run_multihost_demo.py"),
         "--steps", "8", "--port", "12977"],
        capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIHOST DEMO OK" in r.stdout
