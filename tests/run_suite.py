#!/usr/bin/env python
"""Green single-command CI runner: every test file in its own pytest
process (XLA state does not survive dozens of large compiles in one
process — the known full-suite segfault), a few files in parallel.

Usage:  python tests/run_suite.py [-jN]   (default -j2)

Exit code 0 iff every file passes.  Prints a per-file summary line and
a final total.
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent

# Longest files first so the tail isn't serialised on one straggler.
SLOW_FIRST = [
    "test_inter_oracle.py", "test_bframes.py", "test_inter_e2e.py",
    "test_e2e_intra.py", "test_main10.py", "test_rdoq.py",
]

# Files whose tests each get their OWN process: XLA:CPU reliably
# aborts mid-compile after several whole-frame compiles accumulate in
# one process (the round-1 "full suite segfaults" family).
PER_TEST = {"test_main10.py", "test_bframes.py", "test_inter_oracle.py"}


def all_files() -> list[str]:
    names = sorted(p.name for p in HERE.glob("test_*.py"))
    head = [n for n in SLOW_FIRST if n in names]
    return head + [n for n in names if n not in head]


def _env():
    sys.path.insert(0, str(REPO))
    from hmtpu.utils.cachedir import jax_cache_dir
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", jax_cache_dir())
    return env


def _pytest(target: str, env) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pytest", target, "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=3600)


def _summary(res) -> str:
    tail = (res.stdout or "").strip().splitlines()
    for line in reversed(tail):
        if re.search(r"\d+ (passed|failed|error|skipped)", line):
            return line.strip("= ")
    return (tail[-1] if tail
            else (res.stderr.strip().splitlines() or ["?"])[-1])


def run_one(name: str) -> tuple[str, int, float, str]:
    env = _env()
    t0 = time.time()
    if name in PER_TEST:
        # one process per test id
        col = subprocess.run(
            [sys.executable, "-m", "pytest", f"tests/{name}",
             "--collect-only", "-q", "--no-header",
             "-p", "no:cacheprovider"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=600)
        ids = [l.strip() for l in col.stdout.splitlines()
               if "::" in l]
        rc, parts = 0, []
        for tid in ids:
            r = _pytest(tid, env)
            if r.returncode not in (0, 5):
                rc = r.returncode
            parts.append(_summary(r))
        return (name, rc, time.time() - t0,
                "; ".join(p.split(" in ")[0] for p in parts))
    res = _pytest(f"tests/{name}", env)
    return name, res.returncode, time.time() - t0, _summary(res)


def main() -> int:
    jobs = 2
    for a in sys.argv[1:]:
        if a.startswith("-j"):
            jobs = int(a[2:])
    files = all_files()
    failed = []
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=jobs) as ex:
        for name, rc, dt, summary in ex.map(run_one, files):
            # pytest rc 5 = no tests collected (e.g. oracle skipped)
            ok = rc in (0, 5)
            print(f"{'PASS' if ok else 'FAIL'} {name:28s} "
                  f"{dt:7.1f}s  {summary}", flush=True)
            if not ok:
                failed.append(name)
    print(f"\ntotal {time.time() - t0:.0f}s; "
          f"{len(files) - len(failed)}/{len(files)} files green")
    if failed:
        print("failed:", " ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
