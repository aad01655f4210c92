"""Multi-process (multi-host-shaped) segment encoding over
jax.distributed (SURVEY §2.4 DCN axis): frames shipped to every
process via broadcast_one_to_all, closed IDR segments encoded per
process, bitstreams gathered to process 0 — byte-identical to the
single-process encode by construction.

Opt-in (HMTPU_MULTIHOST_TEST=1): the test spawns two fresh Python
processes that bind a localhost coordinator port and compile the
96x64 encoder — deliberately excluded from the default suite to keep
it deterministic on small CI hosts.  `python tools/multihost_encode.py`
runs the same check standalone (the round-5 run is recorded in
ROADMAP.md: multihost_byte_identical true)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("HMTPU_MULTIHOST_TEST") != "1",
                    reason="opt-in: set HMTPU_MULTIHOST_TEST=1")
def test_two_process_segments_byte_identical():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools",
                                      "multihost_encode.py"),
         "--nprocs", "2", "--frames", "8"],
        capture_output=True, text=True, timeout=1500, cwd=ROOT,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stdout + out.stderr
    assert '"multihost_byte_identical": true' in out.stdout, out.stdout
