"""A/B the two terminal-cost hooks on-chip (docs/DESIGN.md §12).

Three configurations at a storage-meaningful shape (K=10k, T=30, nx=4):

- ``none``       — no terminal cost (floor)
- ``full_hook``  — ``terminal_state_cost(states, actions)`` applied to the
  last slice: forces (K, T, nx) rollout storage + the XLA path
- ``final_hook`` — the SAME function via ``terminal_final_cost``: evaluated
  on the scan carry (no storage), XLA path
- ``final_pallas`` — the final hook on the fused transposed kernel
  (``use_pallas=True``; ineligible for the full hook)

Usage: python benchmarks/terminal_modes.py [--quick]
"""
import argparse
import json

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI

from benchmark_mppi import benchmark_device_solve  # noqa: E402

DT = jnp.float32
NX, NU = 4, 3
GOAL = jnp.arange(1.0, 1.0 + NX, dtype=DT)


def dynamics(state, action):
    # concatenate-pad (scatter is outside the batch-last kernel vocabulary)
    pad = jnp.zeros(action.shape[:-1] + (NX - NU,), action.dtype)
    return 0.98 * state + jnp.concatenate([action, pad], axis=-1)


def cost(state, action):
    return ((state - GOAL) ** 2).sum(axis=-1)


def fterm(s, a):
    return 5.0 * ((s - GOAL) ** 2).sum(axis=-1)


def full_term(states, actions):
    return fterm(states[..., -1, :], actions[..., -1, :])


def run(K=10_000, T=30, solves=500, repeats=3):
    kw = dict(num_samples=K, horizon=T, lambda_=1.0, seed=0,
              u_min=-jnp.ones(NU, DT), u_max=jnp.ones(NU, DT))
    x0 = jnp.full((NX,), -2.0, DT)
    sigma = 0.5 * jnp.eye(NU, dtype=DT)
    out = {}
    variants = [
        ("none", dict()),
        ("full_hook", dict(terminal_state_cost=full_term)),
        ("final_hook", dict(terminal_final_cost=fterm)),
        ("final_pallas", dict(terminal_final_cost=fterm, use_pallas=True)),
    ]
    for name, extra in variants:
        ctrl = MPPI(dynamics, cost, NX, sigma, **kw, **extra)
        r = benchmark_device_solve(ctrl, dynamics, x0,
                                   solves_per_dispatch=solves, repeats=repeats)
        out[name] = r["median_s"]
        print(f"{name:14s} {r['median_s'] * 1e6:8.1f} us/solve", flush=True)
    print(json.dumps({k: v for k, v in out.items()}))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CPU smoke)")
    args = ap.parse_args()
    if args.quick:
        run(K=256, T=10, solves=20, repeats=2)
    else:
        run()
