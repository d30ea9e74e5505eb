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
    counts = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    for kind in counts:
        m = re.search(rf"(\d+) {kind}", tail)
        if m:
            counts[kind] = int(m.group(1))
    result = {
        "cmd": "pytest tpu_tests/ -q",
        "rc": proc.returncode,
        "ok": proc.returncode == 0 and counts["passed"] > 0,
        "duration_s": round(dur, 1),
        **counts,
        "tail": "\n".join(tail.strip().splitlines()[-5:]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
