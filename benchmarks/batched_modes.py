"""MPPI_Batched sampling-mode A/B: XLA scan vs fused kernel-RNG vs fused
noise-operand, through the identical `make_batched_step` plumbing.

The batched fused kernel (pallas_rollout.make_transposed_batched_solve)
regenerates the reference's shared noise (mppi.py:837-838) once per plant from
block-indexed hardware seeds — N-fold redundant bits->normal VPU work that the
round-3 measurement showed losing to XLA below K≈2048 (docs/BENCHMARKS.md).
The noise-operand mode instead draws once with the XLA rbg pipeline and feeds
the final (D, K_pad) noise as a kernel operand, trading the redundant VPU work
for N·K·D·4B of HBM block reads.  This script measures all three at a given
(N, K, T) so the `use_pallas` routing decision is pinned to numbers.

Run on the TPU: python benchmarks/batched_modes.py --plants 64 --samples 1024
Sweep:          for K in 1024 2048 16384; do ... --samples $K; done
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams
from pytorch_mppi_tpu.ops import pallas_rollout as PR
from pytorch_mppi_tpu.ops import solve as S
from pytorch_mppi_tpu.utils.timer import median_host_rtt

DTYPE = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DTYPE)
GOAL = jnp.array([2.0, 2.0], DTYPE)


def dynamics(state, action):
    return state + action @ B.T


def running_cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def build(config, N, mode):
    """A batched step bundle for one sampling mode."""
    if mode == "xla":
        return S.make_batched_step(config, N, dynamics, running_cost, jit=False)
    wdyn = S.wrap_dynamics(config, dynamics)
    wcost = S.wrap_cost(config, running_cost)
    solve = PR.make_transposed_batched_solve(
        config, N, wdyn, wcost, noise_operand=(mode == "fused-operand"))
    return S.make_batched_step(config, N, dynamics, running_cost, jit=False,
                               transposed_solve_override=solve)


def measure(fns, config, N, steps, repeats=5, rtt=0.0):
    params = MPPIParams(
        noise_mu=jnp.zeros(2, DTYPE),
        noise_sigma=jnp.eye(2, dtype=DTYPE),
        lambda_=jnp.asarray(1.0, DTYPE),
        u_min=jnp.full((2,), -1.0, DTYPE),
        u_max=jnp.full((2,), 1.0, DTYPE),
        u_init=jnp.zeros(2, DTYPE),
    )

    @jax.jit
    def loop(params, state, x):
        def body(carry, _):
            state, x = carry
            state, actions, _ = fns.step(params, state, x)
            x = dynamics(x, actions)
            return (state, x), None

        (state, x), _ = lax.scan(body, (state, x), None, length=steps)
        return x.sum(axis=0)

    key = jax.random.PRNGKey(0)
    k_u, k_s, k_x = jax.random.split(key, 3)
    U0 = S.sample_noise(k_u, (N, config.T), params, DTYPE)
    state = S.BatchedState(U=U0, key=k_s)
    x = jax.random.uniform(k_x, (N, 2), DTYPE, -3.0, 3.0)

    out = np.asarray(loop(params, state, x))  # compile + sanity fetch
    if not np.isfinite(out).all():
        raise RuntimeError("non-finite closed-loop output")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(loop(params, state, x))
        times.append(time.perf_counter() - t0)
    wall = max(sorted(times)[len(times) // 2] - rtt, 1e-9)
    return wall / steps  # seconds per N-plant control step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--plants", type=int, default=64)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", default="xla,fused-rng,fused-operand")
    args = ap.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    print(f"# backend: {jax.default_backend()}, N={args.plants}, "
          f"K={args.samples}, T={args.horizon}", file=sys.stderr)
    rtt = median_host_rtt()
    config = MPPIConfig(nx=2, nu=2, K=args.samples, T=args.horizon,
                        dtype=DTYPE, diag_sigma=True)

    results = {"N": args.plants, "K": args.samples, "T": args.horizon}
    for mode in args.modes.split(","):
        if mode == "fused-rng" and not on_tpu:
            print(f"# [{mode}] skipped: in-kernel PRNG needs the TPU backend",
                  file=sys.stderr)
            continue
        try:
            fns = build(config, args.plants, mode)
            per_step = measure(fns, config, args.plants, args.steps, rtt=rtt)
        except Exception as e:  # surface, keep the sweep going
            print(f"# [{mode}] FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            continue
        results[mode] = per_step
        print(f"# [{mode}] {per_step*1e6:9.1f} us/step "
              f"({args.plants/per_step:.0f} plant-solves/s)", file=sys.stderr)

    print(json.dumps(results, default=float))
    return results


if __name__ == "__main__":
    main()
