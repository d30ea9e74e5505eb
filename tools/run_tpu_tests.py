"""Run the TPU test lane and record a JSON artifact.

Usage: python tools/run_tpu_tests.py [--out TPU_TESTS.json]

Runs ``pytest tpu_tests/ -q`` against the real TPU backend (the lane
self-skips if none is available) and writes pass/fail/skip counts plus
duration to the artifact, mirroring the driver's BENCH_r{N}.json convention.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "TPU_TESTS.json"))
    args = ap.parse_args()

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tpu_tests/", "-q", "--no-header"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=3600,
    )
    dur = time.time() - t0
    tail = proc.stdout[-6000:]
    # parse ONLY pytest's final summary line ("N passed, M skipped in 12.3s"),
    # not the whole tail — a number+keyword inside a warning line must not be
    # miscounted as a result
    counts = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    summary = None
    for line in reversed(tail.strip().splitlines()):
        if re.search(r"\d+ (passed|failed|skipped|error)", line) and " in " in line:
            summary = line
            break
    if summary is not None:
        for kind in counts:
            m = re.search(rf"(\d+) {kind}", summary)
            if m:
                counts[kind] = int(m.group(1))
    ran = counts["passed"] + counts["failed"] + counts["error"]
    # a lane that self-skips entirely (no TPU available) is a distinct,
    # successful 'skipped' outcome — not a failure
    all_skipped = proc.returncode in (0, 5) and ran == 0 and counts["skipped"] > 0
    result = {
        "cmd": "pytest tpu_tests/ -q",
        "rc": proc.returncode,
        "ok": proc.returncode == 0 and counts["passed"] > 0,
        "outcome": (
            "skipped" if all_skipped
            else "passed" if proc.returncode == 0 and counts["passed"] > 0
            else "failed"
        ),
        "duration_s": round(dur, 1),
        **counts,
        "tail": "\n".join(tail.strip().splitlines()[-5:]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["outcome"] in ("passed", "skipped") else 1


if __name__ == "__main__":
    sys.exit(main())
