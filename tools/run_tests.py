#!/usr/bin/env python
"""Run the test suite as a few fresh pytest processes.

A single long pytest process accumulates several hundred XLA CPU
compilations and can (rarely, ~70% into the full run on this image)
segfault inside XLA's backend_compile — a process-age flake, not a test
failure: every file passes in a fresh process, and the crash point moves
with the file order, not the test content. Chunking the files across a
handful of subprocesses sidesteps it deterministically and parallels how
the suite is validated (split runs are equivalent: tests share no state
across files).

Usage: python tools/run_tests.py [n_chunks=4] [extra pytest args...]
Exit code is nonzero iff any chunk fails.
"""

import glob
import os
import subprocess
import sys

def main() -> int:
    args = sys.argv[1:]
    n = 4
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    # round-robin so the heavy files (fuzz, large, mesh) spread out
    chunks = [files[i::n] for i in range(n)]
    rc = 0
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        print(f"--- chunk {i + 1}/{n}: {[os.path.basename(f) for f in chunk]}",
              flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *args, *chunk], cwd=root
        )
        rc |= r.returncode
        print(f"--- chunk {i + 1}/{n} exit {r.returncode}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
