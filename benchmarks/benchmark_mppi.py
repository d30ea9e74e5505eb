"""Performance and solution-quality benchmark sweeps.

Replicates the reference harness (``/root/reference/tests/benchmark_mppi.py``)
sweeps — K in {50,100,500,1000,5000,10000}, T in {5,10,15,30,50}, feature variants,
Pallas-vs-XLA, nx=10/nu=3, MPPI/SMPPI/KMPPI comparison, multi-step loops, and
solution-quality trials — on the same dependency-free 2D problem.

Run: python benchmarks/benchmark_mppi.py            (TPU if available)
     JAX_PLATFORMS=cpu python benchmarks/benchmark_mppi.py
Writes benchmark_results.json.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import KMPPI, MPPI, SMPPI, RBFKernel
from pytorch_mppi_tpu.utils.timer import benchmark_command

DTYPE = jnp.float32
SEED = 42

B_MATRIX = jnp.array([[1.0, 0.0], [0.0, -1.0]], DTYPE)
GOAL = jnp.array([2.0, 2.0], DTYPE)


def dynamics(state, action):
    return state + action @ B_MATRIX.T


def cost(state, action):
    dx = GOAL - state
    return (dx**2).sum(axis=-1)


def terminal(states, actions):
    dx = GOAL - states[..., -1, :]
    return (dx**2).sum(axis=-1)


def dynamics_nd(state, action):
    delta = jnp.zeros_like(state)
    delta = delta.at[..., :3].set(action)
    return state + delta


def cost_nd(state, action):
    return (state**2).sum(axis=-1)


def benchmark_multi_step(ctrl, state, dynamics_fn, num_steps=20, num_warmup=2, num_iters=5):
    """Full closed-loop timing (reference benchmark_mppi.py:116-145)."""
    for _ in range(num_warmup):
        ctrl.reset()
        s = state
        for _ in range(num_steps):
            a = ctrl.command(s)
            s = dynamics_fn(s[None], a[None])[0]
        jax.block_until_ready(s)
    times = []
    for _ in range(num_iters):
        ctrl.reset()
        s = state
        t0 = time.perf_counter()
        for _ in range(num_steps):
            a = ctrl.command(s)
            s = dynamics_fn(s[None], a[None])[0]
        jax.block_until_ready(s)
        times.append(time.perf_counter() - t0)
    mean_t = sum(times) / len(times)
    return {"mean_s": mean_t, "min_s": min(times), "max_s": max(times),
            "per_step_s": mean_t / num_steps, "num_steps": num_steps}


def evaluate_quality(ctrl_factory, state, dynamics_fn, cost_fn, goal,
                     num_steps=20, num_trials=5):
    """Solution quality over seeded trials (reference benchmark_mppi.py:148-190)."""
    per_trial = []
    for trial in range(num_trials):
        ctrl = ctrl_factory(SEED + trial)
        s = state
        total_cost = 0.0
        actions = []
        for _ in range(num_steps):
            a = ctrl.command(s)
            actions.append(a)
            total_cost += float(cost_fn(s[None], a[None])[0])
            s = dynamics_fn(s[None], a[None])[0]
        final_dist = float(jnp.linalg.norm(s - goal))
        smooth = float(jnp.abs(jnp.diff(jnp.stack(actions), axis=0)).sum())
        per_trial.append({"accumulated_cost": total_cost, "final_dist": final_dist,
                          "control_smoothness": smooth})
    agg = {}
    for k in ("accumulated_cost", "final_dist", "control_smoothness"):
        vals = [t[k] for t in per_trial]
        agg[f"{k}_mean"] = float(np.mean(vals))
        agg[f"{k}_std"] = float(np.std(vals))
    agg["per_trial"] = per_trial
    return agg


def run_benchmarks():
    results = {}
    device = jax.devices()[0].platform
    sigma = jnp.eye(2, dtype=DTYPE)
    start = jnp.array([-3.0, -2.0], DTYPE)

    print(f"=== device: {device} ===")

    print("\n--- MPPI: Varying K (T=15) ---")
    for K in [50, 100, 500, 1000, 5000, 10000]:
        ctrl = MPPI(dynamics, cost, 2, sigma, num_samples=K, horizon=15,
                    lambda_=1.0, seed=SEED)
        res = benchmark_command(ctrl, start)
        results[f"{device}/mppi/K={K}_T=15"] = res
        print(f"  K={K:>6d}: {res['median_s']*1000:>8.2f} ms")

    print("\n--- MPPI: Varying T (K=500) ---")
    for T in [5, 10, 15, 30, 50]:
        ctrl = MPPI(dynamics, cost, 2, sigma, num_samples=500, horizon=T,
                    lambda_=1.0, seed=SEED)
        res = benchmark_command(ctrl, start)
        results[f"{device}/mppi/K=500_T={T}"] = res
        print(f"  T={T:>5d}: {res['median_s']*1000:>8.2f} ms")

    print("\n--- MPPI: Feature variations (K=500, T=15) ---")
    feature_configs = [
        ("base", {}),
        ("terminal_cost", {"terminal_state_cost": terminal}),
        ("noise_abs_cost", {"noise_abs_cost": True}),
        ("bounded", {"u_max": jnp.array([1.0, 1.0], DTYPE)}),
        ("M=3", {"rollout_samples": 3, "rollout_var_cost": 0.1}),
        ("null_action", {"sample_null_action": True}),
    ]
    for name, extra in feature_configs:
        ctrl = MPPI(dynamics, cost, 2, sigma, num_samples=500, horizon=15,
                    lambda_=1.0, seed=SEED, **extra)
        res = benchmark_command(ctrl, start)
        results[f"{device}/mppi_feat/{name}"] = res
        print(f"  {name:<20s}: {res['median_s']*1000:>8.2f} ms")

    print("\n--- Pallas vs XLA (K=10000, T=30) ---")
    for name, use_pallas in [("xla", False), ("pallas", True)]:
        ctrl = MPPI(dynamics, cost, 2, sigma, num_samples=10000, horizon=30,
                    lambda_=1.0, seed=SEED, use_pallas=use_pallas)
        res = benchmark_command(ctrl, start)
        results[f"{device}/fused/{name}"] = res
        print(f"  {name:<8s}: {res['median_s']*1000:>8.2f} ms")

    print("\n--- Comparison + loop + quality: MPPI vs SMPPI vs KMPPI (K=500, T=15) ---")
    variants = [
        ("MPPI", lambda s: MPPI(dynamics, cost, 2, sigma, num_samples=500,
                                horizon=15, lambda_=1.0, seed=s)),
        ("SMPPI", lambda s: SMPPI(dynamics, cost, 2, sigma, num_samples=500,
                                  horizon=15, lambda_=1.0, seed=s,
                                  w_action_seq_cost=5.0)),
        ("KMPPI", lambda s: KMPPI(dynamics, cost, 2, sigma, num_samples=500,
                                  horizon=15, lambda_=1.0, seed=s,
                                  num_support_pts=5, kernel=RBFKernel(sigma=2.0))),
    ]
    for label, factory in variants:
        ctrl = factory(SEED)
        res = benchmark_command(ctrl, start)
        results[f"{device}/compare/{label}"] = res
        loop = benchmark_multi_step(factory(SEED), start, dynamics)
        results[f"{device}/loop/{label}"] = loop
        q = evaluate_quality(factory, start, dynamics, cost, GOAL)
        results[f"{device}/quality/{label}"] = q
        print(f"  {label:<8s}: {res['median_s']*1000:>7.2f} ms | loop "
              f"{loop['mean_s']*1000:>7.1f} ms | cost {q['accumulated_cost_mean']:.1f}"
              f"±{q['accumulated_cost_std']:.1f} dist {q['final_dist_mean']:.2f} "
              f"smooth {q['control_smoothness_mean']:.1f}")

    print("\n--- Higher dimensional (nx=10, nu=3, K=500, T=15) ---")
    sigma_nd = jnp.eye(3, dtype=DTYPE)
    start_nd = jnp.asarray(np.random.RandomState(SEED).randn(10), DTYPE)
    ctrl = MPPI(dynamics_nd, cost_nd, 10, sigma_nd, num_samples=500, horizon=15,
                lambda_=1.0, seed=SEED)
    res = benchmark_command(ctrl, start_nd)
    results[f"{device}/mppi/nx=10_nu=3"] = res
    print(f"  nx=10, nu=3: {res['median_s']*1000:>8.2f} ms")

    return results


if __name__ == "__main__":
    results = run_benchmarks()
    with open("benchmark_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\nResults saved to benchmark_results.json")
