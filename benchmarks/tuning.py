"""Tuning-throughput benchmark: sequential per-candidate evaluation vs the
population-parallel (vmapped, one-dispatch) path, for all three native
optimizers (CMA-ES local, Sobol global, CMA-ME quality-diversity).

The reference parallelizes tuning trials by scheduling them onto Ray workers
(``/root/reference/src/pytorch_mppi/autotune_global.py:128-140``); here the
candidates become a leading batch axis of the traced hyperparameter pytree
(``autotune.PopulationEvaluator``), so a whole generation evaluates in one
device dispatch.

Usage:  python benchmarks/tuning.py [--cpu] [--steps N]
Prints one JSON line per (optimizer, path) with seconds per optimize_step.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--steps", type=int, default=3, help="timed optimize_steps")
    ap.add_argument("--pop", type=int, default=16, help="population / batch size")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pytorch_mppi_tpu import MPPI, autotune, autotune_global, autotune_qd
    from pytorch_mppi_tpu.models import Toy2DEnvironment

    DT = jnp.float32
    R, M = 10, 5  # refinement solves x trajectories per candidate
    K, T = 1024, 15
    print(f"# device: {jax.devices()[0].device_kind} ({jax.devices()[0].platform})",
          file=sys.stderr)

    def make_problem():
        env = Toy2DEnvironment(terminal_scale=10.0, dtype=DT)
        mppi = MPPI(
            env.dynamics, env.running_cost, 2,
            noise_sigma=jnp.diag(jnp.array([5.0, 5.0], DT)),
            num_samples=K, horizon=T,
            u_max=jnp.array([2.0, 2.0], DT), lambda_=1.0, seed=1,
        )
        return env, mppi

    def make_sequential_eval(env, mppi):
        """The reference's pattern: apply params to the live controller, run the
        refinement loop eagerly, fetch the cost to host per candidate."""

        def evaluate():
            costs, rollouts = [], []
            for _ in range(M):
                mppi.reset()
                for _ in range(R):
                    mppi.command(env.start, shift_nominal_trajectory=False)
                rollout = mppi.get_rollouts(env.start)[0]
                c = env.running_cost(rollout, mppi.U).sum()
                costs.append(float(c))  # host sync, as a host-driven loop pays
                rollouts.append(rollout)
            return autotune.EvaluationResult(
                jnp.asarray(costs), jnp.stack(rollouts)
            )

        return evaluate

    def optimizers(seed=0):
        return {
            "cmaes": lambda: autotune.CMAESOpt(population=args.pop, sigma=0.5,
                                               seed=seed),
            "global_sobol": lambda: autotune_global.GlobalSearchOpt(
                batch_size=args.pop, seed=seed),
            "cmame_qd": lambda: autotune_qd.CMAMEOpt(population=args.pop,
                                                     sigma=1.0, bins=10,
                                                     seed=seed),
        }

    def bench(opt_name, make_opt, use_population):
        env, mppi = make_problem()
        params = [autotune_global.SigmaGlobalParameter(mppi),
                  autotune_global.LambdaGlobalParameter(mppi)]
        kw = {}
        if use_population:
            kw["population_evaluate_fn"] = autotune.PopulationEvaluator(
                mppi, env.start, num_refinement_steps=R, num_trajectories=M
            )
        tuner = autotune_global.AutotuneGlobal(
            params, evaluate_fn=make_sequential_eval(env, mppi),
            optimizer=make_opt(), **kw,
        )
        tuner.optimize_step()  # warmup: compiles everything
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            tuner.optimize_step()
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    results = {}
    for name, make_opt in optimizers().items():
        seq = bench(name, make_opt, use_population=False)
        pop = bench(name, make_opt, use_population=True)
        results[name] = (seq, pop)
        print(json.dumps({
            "optimizer": name, "population": args.pop,
            "candidates_per_step": args.pop,
            "sequential_s": round(seq, 4), "vmapped_s": round(pop, 4),
            "speedup": round(seq / pop, 1),
        }))

    # gradient optimizer: no sequential counterpart (it REQUIRES the
    # differentiable evaluator); one optimize_step = 5 Adam updates, each a
    # value_and_grad through R refinement solves, + 1 scoring dispatch
    env, mppi = make_problem()
    ev = autotune.PopulationEvaluator(
        mppi, env.start, num_refinement_steps=R, num_trajectories=M
    )
    tuner = autotune.Autotune(
        [autotune.SigmaParameter(mppi), autotune.LambdaParameter(mppi)],
        evaluate_fn=make_sequential_eval(env, mppi),
        optimizer=autotune.GradientOpt(lr=0.1, steps_per_iteration=5),
        population_evaluate_fn=ev,
    )
    tuner.optimize_step()  # warmup
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        tuner.optimize_step()
        times.append(time.perf_counter() - t0)
    times.sort()
    grad_s = times[len(times) // 2]
    results["gradient"] = (None, grad_s)
    print(json.dumps({
        "optimizer": "gradient", "adam_updates_per_step": 5,
        "vmapped_s": round(grad_s, 4),
        "note": "value_and_grad through R solves; no sequential counterpart",
    }))
    return results


if __name__ == "__main__":
    main()
