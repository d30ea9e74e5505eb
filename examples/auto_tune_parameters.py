"""Hyperparameter autotuning demo — port of the reference
``/root/reference/tests/auto_tune_parameters.py``: tune sigma/lambda/horizon of an
MPPI controller on the 2D navigation task with (a) native CMA-ES local search,
(b) native Sobol global search, (c) native CMA-ME quality diversity.

Run: python examples/auto_tune_parameters.py
"""
import logging

import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import MPPI, autotune, autotune_global, autotune_qd
from pytorch_mppi_tpu.models import Toy2DEnvironment

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(fast: bool = False):
    # f32 explicitly: without jax_enable_x64 JAX would silently downcast f64
    # anyway, and f32 is the TPU-native precision (reference uses f64 on CPU)
    dtype = jnp.float32
    env = Toy2DEnvironment(terminal_scale=10.0, dtype=dtype)

    # fast=True: reduced shapes/iterations for the smoke test
    # (tests/test_examples.py) — same code paths, ~10x less work
    n_iters = 2 if fast else 5
    mppi = MPPI(
        env.dynamics, env.running_cost, 2,
        noise_sigma=jnp.diag(jnp.array([5.0, 5.0], dtype)),
        num_samples=128 if fast else 500, horizon=10 if fast else 20,
        terminal_state_cost=env.terminal_cost,
        u_max=jnp.array([2.0, 2.0], dtype),
        lambda_=1.0, seed=1,
    )

    # use the same nominal trajectory for every evaluation for fairness
    # (reference auto_tune_parameters.py:256-276)
    nominal_trajectory = mppi.U
    num_refinement_steps = 3 if fast else 10
    num_trajectories = 2 if fast else 5

    def evaluate():
        costs, rollouts = [], []
        for _ in range(num_trajectories):
            mppi.U = nominal_trajectory
            mppi.change_horizon(mppi.T)
            for _ in range(num_refinement_steps):
                mppi.command(env.start, shift_nominal_trajectory=False)
            rollout = mppi.get_rollouts(env.start)[0]
            this_cost = 0.0
            for t in range(len(rollout) - 1):
                this_cost = this_cost + env.running_cost(rollout[t], mppi.U[t])
            this_cost = this_cost + env.terminal_cost(rollout, mppi.U)
            rollouts.append(rollout)
            costs.append(this_cost)
        return autotune.EvaluationResult(jnp.stack(costs), jnp.stack(rollouts))

    # (a) local CMA-ES search from the current parameters
    params_to_tune = [
        autotune.SigmaParameter(mppi),
        autotune.HorizonParameter(mppi),
        autotune.LambdaParameter(mppi),
    ]
    tuner = autotune.Autotune(
        params_to_tune, evaluate_fn=evaluate,
        optimizer=autotune.CMAESOpt(sigma=1.0, population=6, seed=1),
    )
    for i in range(n_iters):
        res = tuner.optimize_step()
    best = tuner.get_best_result()
    tuner.apply_parameters(best.params)
    print(f"CMA-ES best cost {float(jnp.mean(best.costs)):.2f} params "
          f"{ {k: np.asarray(v).tolist() for k, v in best.params.items()} }")

    # (b) global quasi-random (Sobol) search over explicit search spaces
    params_to_tune = [
        autotune_global.SigmaGlobalParameter(mppi),
        autotune_global.HorizonGlobalParameter(mppi),
        autotune_global.LambdaGlobalParameter(mppi),
    ]
    tuner = autotune_global.AutotuneGlobal(
        params_to_tune, evaluate_fn=evaluate,
        optimizer=autotune_global.GlobalSearchOpt(batch_size=8, seed=1),
    )
    res = tuner.optimize_all(n_iters)
    best = tuner.get_best_result()
    print(f"Global search best cost {float(jnp.mean(best.costs)):.2f}")

    # (c) quality diversity: a set of good-and-diverse hyperparameters
    tuner = autotune_global.AutotuneGlobal(
        params_to_tune, evaluate_fn=evaluate,
        optimizer=autotune_qd.CMAMEOpt(population=6, sigma=1.0, bins=10, seed=1),
    )
    res = tuner.optimize_all(n_iters)
    diverse = tuner.optim.get_diverse_top_parameters(4)
    print(f"QD archive size {len(tuner.optim.archive)}; diverse params:")
    for p in diverse:
        print("  ", {k: np.asarray(v).tolist() for k, v in p.items()})

    # (d) the population-parallel path: every generation evaluates in ONE
    # vmapped device dispatch (6.8-33.8x over the per-candidate loop above,
    # docs/BENCHMARKS.md); horizon candidates group into one dispatch per
    # distinct effective shape
    evaluator = autotune.PopulationEvaluator(
        mppi, env.start, num_refinement_steps=num_refinement_steps,
        num_trajectories=num_trajectories,
    )
    tuner = autotune_global.AutotuneGlobal(
        [autotune_global.SigmaGlobalParameter(mppi),
         autotune_global.HorizonGlobalParameter(
             mppi, search_space=autotune_global.RandInt(5, 30)),
         autotune_global.LambdaGlobalParameter(mppi)],
        evaluate_fn=evaluate,
        optimizer=autotune_global.GlobalSearchOpt(batch_size=8, seed=1),
        population_evaluate_fn=evaluator,
    )
    res = tuner.optimize_all(n_iters)
    best = tuner.get_best_result()
    print(f"Population-parallel global search best cost "
          f"{float(jnp.mean(best.costs)):.2f}")

    # (e) differentiable tuning (no reference counterpart): exact gradients
    # THROUGH the refinement solves — Adam on log-space (sigma, lambda)
    tuner = autotune.Autotune(
        [autotune.SigmaParameter(mppi), autotune.LambdaParameter(mppi)],
        evaluate_fn=evaluate,
        optimizer=autotune.GradientOpt(lr=0.1, steps_per_iteration=5),
        population_evaluate_fn=evaluator,
    )
    for i in range(n_iters):
        res = tuner.optimize_step()
    best = tuner.get_best_result()
    print(f"Gradient (through-the-solve) best cost "
          f"{float(jnp.mean(best.costs)):.2f} params "
          f"{ {k: np.asarray(v).round(3).tolist() for k, v in best.params.items()} }")


if __name__ == "__main__":
    import sys
    main(fast="--fast" in sys.argv)
