"""MPPI vs SMPPI vs KMPPI on the 2D navigation task — port of the reference
comparison driver (``/root/reference/tests/smooth_mppi.py``): LQR + hill costs,
linear-delta dynamics, comparing accumulated cost and control smoothness.

Run: python examples/smooth_mppi.py
"""
import logging

import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import KMPPI, MPPI, SMPPI, RBFKernel
from pytorch_mppi_tpu.models import Toy2DEnvironment

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)

if __name__ == "__main__":
    DTYPE = jnp.float64
    env = Toy2DEnvironment(dtype=DTYPE)
    sigma = jnp.eye(2, dtype=DTYPE) * 0.2
    common = dict(
        nx=2, noise_sigma=sigma, num_samples=500, horizon=20, lambda_=1.0,
        u_min=jnp.array([-1.0, -1.0], DTYPE), u_max=jnp.array([1.0, 1.0], DTYPE),
        terminal_state_cost=env.terminal_cost, seed=42,
    )
    controllers = {
        "MPPI": MPPI(env.dynamics, env.running_cost, **common),
        "SMPPI": SMPPI(env.dynamics, env.running_cost, w_action_seq_cost=50.0,
                       delta_t=1.0, action_min=jnp.array([-1.0, -1.0], DTYPE),
                       action_max=jnp.array([1.0, 1.0], DTYPE), **common),
        "KMPPI": KMPPI(env.dynamics, env.running_cost, num_support_pts=5,
                       kernel=RBFKernel(sigma=2.0), **common),
    }

    try:
        fig = env.start_visualization()
        colors = {"MPPI": "tab:orange", "SMPPI": "tab:purple", "KMPPI": "tab:cyan"}
    except ImportError:
        fig = None

    print(f"{'method':<8s} {'accum cost':>12s} {'final dist':>12s} {'smoothness':>12s}")
    for name, ctrl in controllers.items():
        state = jnp.asarray(env.start)
        total_cost, actions, states = 0.0, [], [state]
        for _ in range(40):
            a = ctrl.command(state)
            actions.append(a)
            total_cost += float(env.running_cost(state[None], a[None])[0])
            state = env.dynamics(state[None], a[None])[0]
            states.append(state)
        final_dist = float(jnp.linalg.norm(state - env.goal))
        smooth = float(jnp.abs(jnp.diff(jnp.stack(actions), axis=0)).sum())
        print(f"{name:<8s} {total_cost:>12.2f} {final_dist:>12.4f} {smooth:>12.3f}")
        if fig is not None:
            env.draw_trajectory(jnp.stack(states), color=colors[name], label=name)

    if fig is not None:
        env.ax.legend()
        print("saved:", env.save_figure("smooth_mppi_trajectories.png"))
