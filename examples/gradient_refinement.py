"""Gradient-refined MPPI: rescue a sample-starved controller with autodiff.

Net-new vs the reference (no counterpart in ``/root/reference``; cf. the
Gauss-Newton-accelerated MPPI line of work, arXiv:2512.04579): because this
framework's whole solve is a pure, differentiable JAX program
(docs/DESIGN.md §8), ``gradient_refinement_steps=N`` can descend the nominal
sequence directly on the exact rollout cost after the sampling stage —
projected Adam through the same ``lax.scan`` rollout the sampler used
(docs/DESIGN.md §10).

This driver A/Bs the pendulum swing-up (the reference flagship config,
``/root/reference/tests/pendulum.py``) at a deliberately starved sample
count.  Measured at K=5 (the default; 3 seeds, 150 steps): mean final
|angle| 0.12 -> 0.01 rad and accumulated cost 519 -> 340 with 10 descent
steps per command — five sampled trajectories plus autodiff do what
sampling alone needs an order of magnitude more rollouts for.

Run: python examples/gradient_refinement.py   (JAX_PLATFORMS=cpu for CPU)
"""
import argparse
import logging

import numpy as np

import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI
from pytorch_mppi_tpu.models import (
    angle_normalize,
    pendulum_dynamics,
    pendulum_running_cost,
)

logging.basicConfig(level=logging.INFO,
                    format="[%(levelname)s %(asctime)s %(pathname)s:%(lineno)d] %(message)s",
                    datefmt="%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)


def swing_up(num_samples, refine_steps, refine_lr, steps, seed):
    ctrl = MPPI(
        pendulum_dynamics, pendulum_running_cost, nx=2,
        noise_sigma=jnp.asarray(10.0, jnp.float32),
        num_samples=num_samples, horizon=15, lambda_=1.0,
        u_min=jnp.asarray(-2.0), u_max=jnp.asarray(2.0), seed=seed,
        gradient_refinement_steps=refine_steps,
        gradient_refinement_lr=refine_lr,
    )
    state = jnp.array([jnp.pi, 1.0], jnp.float32)  # hanging down
    cost_sum = 0.0
    for _ in range(steps):
        action = ctrl.command(state)
        # the model fns are 2-D native (the engine batch-adapts them; the
        # plant step here feeds them a singleton batch)
        state = pendulum_dynamics(state[None], action[None])[0]
        cost_sum += float(pendulum_running_cost(state[None], action[None])[0])
    return abs(float(angle_normalize(state[0]))), cost_sum


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=5,
                   help="deliberately starved K (reference flagship uses 100+)")
    p.add_argument("--refine-steps", type=int, default=10)
    p.add_argument("--refine-lr", type=float, default=0.2)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args(argv)

    rows = []
    for refine in (0, args.refine_steps):
        angles, costs = zip(*(
            swing_up(args.samples, refine, args.refine_lr, args.steps, s)
            for s in range(args.seeds)
        ))
        rows.append((refine, float(np.mean(angles)), float(np.mean(costs))))
        logger.info(
            "K=%d refine_steps=%d: mean final |angle| %.4f rad, "
            "mean accumulated cost %.1f (%d seeds)",
            args.samples, refine, rows[-1][1], rows[-1][2], args.seeds,
        )

    (_, angle_base, cost_base), (_, angle_ref, cost_ref) = rows
    print(f"RESULT base_angle={angle_base:.4f} refined_angle={angle_ref:.4f} "
          f"base_cost={cost_base:.1f} refined_cost={cost_ref:.1f}")
    return rows


if __name__ == "__main__":
    rows = main()
    # the refined starved-K controller must complete the swing-up
    assert rows[1][1] < 0.25, rows
