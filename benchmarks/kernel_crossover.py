"""Fused-kernel vs XLA K-sweep for the SINGLE-plant controllers.

The batched kernel's K≈2048 crossover (benchmarks/batched_modes.py) raised
the question whether the single-plant kernels need a small-K gate too.
This sweep answers it: measured round 4 on v5e, the single-plant fused
kernel wins at EVERY K — by the largest margin at small K — so
``use_pallas=True`` on MPPI/SMPPI/KMPPI routes unconditionally while
``MPPI_Batched`` auto-routes below its measured crossover
(``ops/solve._BATCHED_KERNEL_MIN_K``).  Results table: docs/BENCHMARKS.md.

Chained closed-loop protocol (docs/DESIGN.md §7): S solves per jit dispatch
threaded through the plant, timed region ends with a host fetch, tiny-op
RTT subtracted.  S scales inversely with K so every dispatch comfortably
exceeds the RTT.
"""
import argparse

import jax
import jax.numpy as jnp
from jax import lax

import pytorch_mppi_tpu as pm
from pytorch_mppi_tpu.utils.timer import chained_median_time, median_host_rtt

DT = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
GOAL = jnp.array([2.0, 2.0], DT)


def dyn(s, a):
    return s + a @ B.T


def cost(s, a):
    return ((GOAL - s) ** 2).sum(axis=-1)


def measure(K, T, S, rtt):
    x0 = jnp.array([-3.0, -2.0], DT)
    row = {}
    for label, kw in (("xla", {}), ("pallas", {"use_pallas": True})):
        c = pm.MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=K,
                    horizon=T, lambda_=1.0, seed=0, **kw)
        step = c._fns.step

        @jax.jit
        def loop(params, cstate, x):
            def body(carry, _):
                cs, xx = carry
                cs, a, _ = step(params, cs, xx, None, None)
                return (cs, dyn(xx, a)), None

            (cs, xx), _ = lax.scan(body, (cstate, x), None, length=S)
            return xx

        t = chained_median_time(loop, c._params, c._state, x0,
                                iters_per_dispatch=S, rtt=rtt)
        row[label] = t * 1e6
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--horizon", type=int, default=15)
    p.add_argument("--ks", type=int, nargs="*",
                   default=[256, 512, 1024, 2048, 4096, 10000])
    p.add_argument("--work", type=int, default=40_000_000,
                   help="~K*solves per dispatch (keeps dispatches >> RTT)")
    args = p.parse_args(argv)
    print("# device:", jax.devices()[0])
    rtt = median_host_rtt()
    print(f"# rtt {rtt * 1e3:.1f} ms, T={args.horizon}")
    for K in args.ks:
        S = max(2000, args.work // K)
        row = measure(K, args.horizon, S, rtt)
        win = "pallas" if row["pallas"] < row["xla"] else "xla"
        print(f"K={K:6d}  xla={row['xla']:7.2f}us  "
              f"pallas={row['pallas']:7.2f}us  -> {win}")


if __name__ == "__main__":
    main()
