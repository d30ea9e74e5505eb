"""Per-solve cost of elite reuse (``num_elites``) on both solve paths
(docs/DESIGN.md §11).

At each K: the XLA path with E=0 vs E=4, and the fused transposed kernel
(``use_pallas=True`` + ``fused_artifacts=True``, the eligible elite config)
with E=0 vs E=4 — the elites delta WITHIN each path is the feature's cost;
the fused_artifacts store is priced separately by its own E=0 line.

Usage: python benchmarks/elite_modes.py [--quick]
"""
import argparse
import json

import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI

from benchmark_mppi import benchmark_device_solve  # noqa: E402

DT = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
GOAL = jnp.array([2.0, 2.0], DT)


def dynamics(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def run(ks=(256, 10_000), T=30, solves=500, repeats=3):
    x0 = jnp.array([-3.0, -2.0], DT)
    out = {}
    for K in ks:
        for name, extra in [
            ("xla_e0", dict()),
            ("xla_e4", dict(num_elites=4)),
            ("pallas_fa_e0", dict(use_pallas=True, fused_artifacts=True)),
            ("pallas_fa_e4", dict(use_pallas=True, fused_artifacts=True,
                                  num_elites=4)),
        ]:
            ctrl = MPPI(dynamics, cost, 2, 0.5 * jnp.eye(2, dtype=DT),
                        num_samples=K, horizon=T, lambda_=1.0, seed=0,
                        u_min=-jnp.ones(2, DT), u_max=jnp.ones(2, DT),
                        **extra)
            r = benchmark_device_solve(ctrl, dynamics, x0,
                                       solves_per_dispatch=solves,
                                       repeats=repeats)
            out[f"K{K}_{name}"] = r["median_s"]
            print(f"K={K:6d} {name:13s} {r['median_s'] * 1e6:8.1f} us/solve",
                  flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        run(ks=(256,), T=8, solves=20, repeats=2)
    else:
        run()
