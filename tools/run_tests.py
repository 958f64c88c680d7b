#!/usr/bin/env python
"""Run the full test suite in one pytest process, SEGV-proofed.

Mechanism (root-caused round 4): a single long pytest process accumulates
several hundred XLA CPU compilations and segfaults INSIDE
``xla_bridge``'s ``backend_compile_and_load`` (~70% into the full run;
faulthandler stack captured in docs/development.md). Every file passes in
a fresh process and the crash point moves with file order, not test
content — the crash correlates with the number of LIVE compiled
executables the process holds, not with memory (123 GB free at crash).
Dropping the executable caches between test modules bounds that live set:
``jax.clear_caches()`` per module (tests/conftest.py, GKT_CLEAR_CACHES=1)
ran the whole 880-test suite clean twice in a row at ~10.5 min — faster
than the 4-subprocess chunked fallback it replaces as the default.

Usage:
    python tools/run_tests.py [extra pytest args...]       # single process
    python tools/run_tests.py --chunked [n=4] [args...]    # old fallback
Exit code is nonzero iff any run fails.
"""

import glob
import os
import subprocess
import sys


def main() -> int:
    args = sys.argv[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if not (args and args[0] == "--chunked"):
        env = dict(os.environ, GKT_CLEAR_CACHES="1")
        r = subprocess.run(
            [sys.executable, "-X", "faulthandler", "-m", "pytest", "-q",
             *args, "tests/"],
            cwd=root, env=env,
        )
        return r.returncode

    args = args[1:]
    n = 4
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
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
