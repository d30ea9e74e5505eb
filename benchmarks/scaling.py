"""Scenario-batch scaling benchmark: N parallel MPC plants x K samples over a mesh.

The pod-scale north-star config (BASELINE.json: 1024 plants, K=16k, sharded over
hosts).  With one real chip this measures per-chip scenario throughput; with more
devices (or the 8-device virtual CPU mesh: JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) it measures weak-scaling
efficiency: solves/s at D devices with N ∝ D, vs D x single-device throughput.

Run: python benchmarks/scaling.py [--plants 64] [--samples 1024] [--steps 20]
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
from pytorch_mppi_tpu.ops import solve as S
from pytorch_mppi_tpu.parallel import make_mesh

DTYPE = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DTYPE)
GOAL = jnp.array([2.0, 2.0], DTYPE)


def dynamics(state, action):
    return state + action @ B.T


def running_cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def measure(N, K, T, steps, mesh=None, env_axis="data", sample_axis=None, repeats=3):
    config = MPPIConfig(nx=2, nu=2, K=K, T=T, dtype=DTYPE)
    fns = S.make_batched_step(
        config, N, dynamics, running_cost, jit=False,
        mesh=mesh, env_axis=env_axis, sample_axis=sample_axis,
    )
    params = MPPIParams(
        noise_mu=jnp.zeros(2, DTYPE),
        noise_sigma=jnp.eye(2, dtype=DTYPE),
        lambda_=jnp.asarray(1.0, DTYPE),
        u_min=jnp.full((2,), -jnp.inf, DTYPE),
        u_max=jnp.full((2,), jnp.inf, DTYPE),
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
    U0 = S.sample_noise(k_u, (N, T), params, DTYPE)
    state = S.BatchedState(U=U0, key=k_s)
    x = jax.random.uniform(k_x, (N, 2), DTYPE, -3.0, 3.0)

    # honest timing on async backends: end with a host fetch, subtract the
    # median tiny-op RTT (a single sample is too noisy: the relay RTT jitters
    # tens of ms, more than a fast dispatch itself)
    from pytorch_mppi_tpu.utils.timer import median_host_rtt

    rtt = median_host_rtt()

    np.asarray(loop(params, state, x))  # compile
    # auto-scale dispatches until the timed region dominates the RTT; the
    # steps-loop already runs inside one jit, so we just issue it back-to-back
    # (async dispatch pipelines, only the last fetch synchronizes)
    reps_per_timing = 1
    while True:
        t0 = time.perf_counter()
        outs = [loop(params, state, x) for _ in range(reps_per_timing)]
        np.asarray(outs[-1])
        elapsed = time.perf_counter() - t0
        if elapsed > max(10 * rtt, 0.3) or reps_per_timing >= 4096:
            break
        reps_per_timing *= 4

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [loop(params, state, x) for _ in range(reps_per_timing)]
        np.asarray(outs[-1])
        times.append(time.perf_counter() - t0)
    wall = max(sorted(times)[len(times) // 2] - rtt, 1e-9)
    solves = N * steps * reps_per_timing
    return solves / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plants", type=int, default=64, help="plants per device")
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    n_dev = jax.device_count()
    print(f"# devices: {n_dev} ({jax.devices()[0].platform})", file=sys.stderr)

    base = measure(args.plants, args.samples, args.horizon, args.steps)
    print(f"# 1-device-equivalent (N={args.plants}): {base:.1f} plant-solves/s",
          file=sys.stderr)

    results = {"single": base}
    if n_dev > 1 and jax.devices()[0].platform == "cpu":
        # N virtual devices share ONE physical CPU: weak scaling adds N x work
        # on fixed silicon, so measured "efficiency" trends to 1/N by
        # construction. These runs validate the sharded program (collectives,
        # bit-equality), not hardware scaling — only real multi-chip runs
        # measure efficiency.
        print("# NOTE: virtual CPU devices — weak-scaling numbers validate the "
              "sharded program, not hardware efficiency (expected ~1/N).",
              file=sys.stderr)
        results["virtual_devices_note"] = (
            "cpu virtual devices share one socket; efficiency ~1/N expected"
        )
    if n_dev > 1:
        for d in [2, 4, n_dev]:
            if d > n_dev or d in (x for x in results if isinstance(x, int)):
                continue
            mesh = make_mesh((d,), ("data",), devices=jax.devices()[:d])
            rate = measure(args.plants * d, args.samples, args.horizon, args.steps,
                           mesh=mesh)
            eff = rate / (base * d)
            results[d] = {"solves_per_s": rate, "weak_scaling_eff": eff}
            print(f"# {d} devices (N={args.plants*d}): {rate:.1f} plant-solves/s, "
                  f"weak-scaling {eff*100:.1f}%", file=sys.stderr)

    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
