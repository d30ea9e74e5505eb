"""Profiling and timing utilities.

The reference only logs per-command wall-clock at debug level (mppi.py:882-887)
and hand-rolls warmup+trimmed-mean timing in its benchmark harness
(tests/benchmark_mppi.py:84-145).  This module provides the TPU-native versions:
device-synchronized timing (``block_until_ready`` replaces
``torch.cuda.synchronize``) and ``jax.profiler`` trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def _sync(out):
    """Force completion: block_until_ready PLUS a host fetch of one small leaf.
    On some remote backends (e.g. relay-attached TPUs) block_until_ready does not
    actually synchronize; a materializing host transfer always does."""
    out = jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])
    return out


def benchmark_command(ctrl, state, num_warmup: int = 3, num_iters: int = 20):
    """Benchmark ``ctrl.command(state)``, returning stats in seconds — the
    reference harness protocol (benchmark_mppi.py:84-113) with device sync."""
    for _ in range(num_warmup):
        _sync(ctrl.command(state, shift_nominal_trajectory=False))

    times = []
    for _ in range(num_iters):
        ctrl.reset()
        t0 = time.perf_counter()
        _sync(ctrl.command(state))
        times.append(time.perf_counter() - t0)

    times.sort()
    trim = max(1, len(times) // 10)
    trimmed = times[trim:-trim] if len(times) > 2 * trim else times
    return {
        "mean_s": sum(trimmed) / len(trimmed),
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "p99_s": times[min(len(times) - 1, int(len(times) * 0.99))],
        "num_iters": num_iters,
    }


def benchmark_fn(fn: Callable, *args, num_warmup: int = 3, num_iters: int = 20):
    """Benchmark an arbitrary jitted function with forced completion."""
    for _ in range(num_warmup):
        _sync(fn(*args))
    times = []
    for _ in range(num_iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "num_iters": num_iters,
    }


def median_host_rtt(samples: int = 5):
    """Median dispatch+fetch round trip of a tiny jitted op — the fixed host
    overhead the chained-dispatch protocol (docs/DESIGN.md §7) subtracts."""
    x = jax.numpy.zeros((), jax.numpy.float32)
    tiny = jax.jit(lambda z: z + 1)
    np.asarray(tiny(x))  # warm/compile
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def chained_median_time(fn: Callable, *args, iters_per_dispatch: int = 1,
                        repeats: int = 3, rtt=None):
    """Median per-iteration device time of ``fn(*args)`` whose body already
    chains ``iters_per_dispatch`` iterations in one jit dispatch.  The timed
    region ends with a real host fetch; the median tiny-op round trip is
    subtracted (docs/DESIGN.md §7 — ``block_until_ready`` does not synchronize
    on relay-attached devices)."""
    if rtt is None:
        rtt = median_host_rtt()
    np.asarray(jax.numpy.ravel(jax.tree_util.tree_leaves(fn(*args))[0])[:1])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.numpy.ravel(jax.tree_util.tree_leaves(fn(*args))[0])[:1])
        times.append(time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - rtt, 1e-9) / iters_per_dispatch


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a ``jax.profiler`` trace of the enclosed block (view in
    TensorBoard / Perfetto).  SURVEY.md §5.1's TPU-native upgrade."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def probe_device_reachable(timeout_s: float = 600, logger=None) -> bool:
    """Bounded liveness check for a remote accelerator (relay-attached TPU).

    When the relay is down, the first device operation — even
    ``jax.devices()`` — blocks forever rather than raising, so anything that
    must stay bounded (benchmarks, test-lane runners) probes in a subprocess
    under a hard timeout first.  A healthy relay completes the tiny fetch in
    ~2 min (a fresh dial per interpreter start); set
    ``MPPI_SKIP_RELAY_PROBE=1`` to skip the probe on known-healthy setups.
    Distinguishes and reports (via ``logger`` or stderr) a timeout from a
    fast failure (connection refused, plugin error), surfacing the
    subprocess's stderr tail for the latter.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("MPPI_SKIP_RELAY_PROBE", "") == "1":
        return True

    def _report(msg):
        if logger is not None:
            logger.warning(msg)
        else:
            print(f"# WARNING: {msg}", file=sys.stderr)

    code = (
        "import jax, numpy as np; "
        "print(np.asarray(jax.numpy.ones((8, 128)).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        _report(f"device probe timed out after {timeout_s:.0f}s "
                "(relay hung; it dials in ~2 min when healthy)")
        return False
    if proc.returncode != 0:
        tail = "\n".join((proc.stderr or "").strip().splitlines()[-3:])
        _report(f"device probe failed fast (rc={proc.returncode}): {tail}")
        return False
    return True
