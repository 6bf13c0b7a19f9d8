"""Byte-compile every Python file in the repo (package, examples,
profiler, scripts) — the reference CI's first gate
(.github/workflows/test_push.yml:30-33 runs compileall over
gammagl+tests+examples). Catches syntax/indentation breakage in the 90+
example trainers without executing them."""

import compileall
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_compileall():
    ok = True
    for sub in ("gammagl_tpu", "examples", "profiler", "scripts", "tests"):
        ok &= compileall.compile_dir(
            osp.join(ROOT, sub), quiet=1, force=False)
    assert ok, "byte-compilation failed (see stderr)"
