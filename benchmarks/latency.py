"""Per-command latency distribution (p50/p95/p99) — the real-time-budget metric.

Two numbers, both reported, because they answer different questions:

1. **end-to-end command latency**: one ``ctrl.command(state)`` round trip
   including the host<->device hop — what a control loop running on the TPU
   host actually waits per step.  NOTE: on a tunneled/relay device (this dev
   environment) this is dominated by the ~30 ms relay RTT, which is the
   environment, not the framework; on-host PCIe adds ~100 us.
2. **device solve time**: the amortized per-solve device time with the
   host hop excluded (solves chained on-device) — the number the hardware
   is actually committed for per MPC step.

Reference counterpart: per-command timing in ``tests/benchmark_mppi.py:84-113``
(mean over a loop on CPU; no percentile reporting exists there).

Run: python benchmarks/latency.py [--samples 10000] [--horizon 30] [--iters 200]
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams, MPPIState
from pytorch_mppi_tpu.ops import solve as S

DTYPE = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DTYPE)
GOAL = jnp.array([2.0, 2.0], DTYPE)


def dynamics(state, action):
    return state + action @ B.T


def running_cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=10_000)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    K, T = args.samples, args.horizon

    config = MPPIConfig(nx=2, nu=2, K=K, T=T, dtype=DTYPE)
    fns = S.make_mppi_step(config, dynamics, running_cost, jit=False)
    params = MPPIParams(
        noise_mu=jnp.zeros(2, DTYPE),
        noise_sigma=jnp.eye(2, dtype=DTYPE),
        lambda_=jnp.asarray(1.0, DTYPE),
        u_min=jnp.full((2,), -jnp.inf, DTYPE),
        u_max=jnp.full((2,), jnp.inf, DTYPE),
        u_init=jnp.zeros(2, DTYPE),
    )
    key = jax.random.key(42, impl="rbg")
    k_u, k_s = jax.random.split(key)
    U0 = S.sample_noise(k_u, (T,), params, DTYPE)
    x0 = jnp.array([-3.0, -2.0], DTYPE)

    step = jax.jit(lambda p, cs, x: fns.step(p, cs, x, None)[:2])

    # -- 1. end-to-end: one command per host round trip ----------------------
    cs = MPPIState(U=U0, key=k_s)
    state = x0
    cs, a = step(params, cs, state)  # compile
    np.asarray(a)
    e2e = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        cs, a = step(params, cs, state)
        a_host = np.asarray(a)  # the host fetch a real control loop performs
        e2e.append(time.perf_counter() - t0)
        state = dynamics(state[None], jnp.asarray(a_host)[None])[0]

    # -- 2. device-only: S solves chained in one dispatch --------------------
    SPD = 1000

    @jax.jit
    def chained(p, cs, x):
        def body(carry, _):
            cs, x = carry
            cs, a, _ = fns.step(p, cs, x, None)
            x = dynamics(x[None], a[None])[0]
            return (cs, x), None

        (cs, x), _ = lax.scan(body, (cs, x), None, length=SPD)
        return x

    from pytorch_mppi_tpu.utils.timer import chained_median_time, median_host_rtt

    rtt = median_host_rtt()
    dev_solve = chained_median_time(
        chained, params, MPPIState(U=U0, key=k_s), x0,
        iters_per_dispatch=SPD, repeats=5, rtt=rtt,
    )

    out = {
        "config": {"K": K, "T": T},
        "end_to_end_ms": {
            "p50": pct(e2e, 50) * 1e3,
            "p95": pct(e2e, 95) * 1e3,
            "p99": pct(e2e, 99) * 1e3,
        },
        "device_solve_us": dev_solve * 1e6,
        "host_hop_ms": rtt * 1e3,
    }
    print(
        f"# e2e command latency p50/p95/p99: {out['end_to_end_ms']['p50']:.2f}/"
        f"{out['end_to_end_ms']['p95']:.2f}/{out['end_to_end_ms']['p99']:.2f} ms "
        f"(host hop {rtt*1e3:.1f} ms) | device solve {dev_solve*1e6:.1f} us",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
