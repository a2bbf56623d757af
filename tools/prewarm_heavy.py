"""Prewarm + time the heavy test tier, one file per pytest subprocess.

The six `@pytest.mark.heavy` tests compile near-full-size CapsNet
programs (minutes each, cold).  picad_tpu enables JAX's persistent
compilation cache at import (~/.cache/picad_tpu_xla), so the expensive
part is paid ONCE per machine: this tool runs the heavy tier file by
file, printing per-file wall time, and the second invocation measures
the warm-cache budget a reviewer actually pays.

Usage (on a TPU-attached host; heavy tests skip on CPU-only):

    python tools/prewarm_heavy.py            # run + time every heavy file
    python tools/prewarm_heavy.py --files tests/test_train_parity.py

Each file runs in its own subprocess so a backend wedge or OOM in one
file cannot take down the sweep; a non-zero exit or timeout is reported
per file and the sweep continues.  Exit code is non-zero if any file
failed.  See README "Tests / bench" for the measured warm budgets.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every file containing @pytest.mark.heavy tests (grep-maintained; the
# sweep also works with explicit --files)
HEAVY_FILES = [
    "tests/test_device_cache.py",
    "tests/test_fold_flip.py",
    "tests/test_fused_head_model.py",
    "tests/test_jhmdb_e2e.py",
    "tests/test_model_parity.py",
    "tests/test_multihost.py",
    "tests/test_parity_eval.py",
    "tests/test_serve.py",
    "tests/test_sharding.py",
    "tests/test_train_parity.py",
]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--files", nargs="*", default=HEAVY_FILES)
    p.add_argument("--timeout", type=float, default=2400.0,
                   help="per-file wall cap in seconds (cold compiles of "
                   "the 224^2/96^2 steps can take many minutes on weak "
                   "hosts; warm runs are far under this)")
    args = p.parse_args()

    rows, failed = [], []
    for f in args.files:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-m", "heavy",
                 "-q", "--no-header", "-p", "no:cacheprovider"],
                cwd=REPO, timeout=args.timeout,
                capture_output=True, text=True,
            )
            dt = time.perf_counter() - t0
            tail = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
            status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
            if r.returncode not in (0, 5):  # 5 = nothing collected
                failed.append(f)
        except subprocess.TimeoutExpired:
            dt = time.perf_counter() - t0
            tail, status = "(timeout)", "TIMEOUT"
            failed.append(f)
        rows.append((f, dt, status, tail))
        print(f"{f:40s} {dt:8.1f}s  {status:8s} {tail}", flush=True)

    total = sum(dt for _, dt, _, _ in rows)
    print(f"{'TOTAL':40s} {total:8.1f}s  "
          f"({len(rows) - len(failed)}/{len(rows)} files ok)")
    if failed:
        print("failed:", ", ".join(failed), file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
