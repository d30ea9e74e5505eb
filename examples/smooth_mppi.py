"""MPPI vs SMPPI vs KMPPI on the 2D navigation task — port of the reference
comparison driver (``/root/reference/tests/smooth_mppi.py``): LQR + hill costs,
linear-delta dynamics, comparing accumulated cost and control smoothness.

Run: python examples/smooth_mppi.py [--gif]

With ``--gif``, each controller also records a per-step animation of the
rollout evolution — candidate rollouts colored by cost plus the executed
trajectory — to ``<name>_evolution.gif`` (the reference records the same
evolution frames to gifs, smooth_mppi.py:265-285, via window_recorder/ffmpeg;
here it is headless PIL, see ``utils/viz.py``).
"""
import logging
import sys

import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import KMPPI, MPPI, SMPPI, RBFKernel
from pytorch_mppi_tpu.models import Toy2DEnvironment

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)

if __name__ == "__main__":
    RECORD_GIF = "--gif" in sys.argv
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
        recorder = None
        if RECORD_GIF and fig is not None:
            from pytorch_mppi_tpu.utils.viz import GifRecorder, draw_rollouts_colored

            recorder = GifRecorder(fig)
        state = jnp.asarray(env.start)
        total_cost, actions, states = 0.0, [], [state]
        for _ in range(40):
            a = ctrl.command(state)
            if recorder is not None:
                # candidate rollouts colored by cost + the path so far
                order = np.argsort(np.asarray(ctrl.cost_total))
                rollouts = np.stack([
                    np.asarray(ctrl.get_rollouts(
                        state, U=ctrl.perturbed_action[i])[0])
                    for i in order[:8]
                ])
                artists = draw_rollouts_colored(
                    env.ax, state, rollouts,
                    np.asarray(ctrl.cost_total)[order[:8]],
                )
                path = np.asarray(jnp.stack(states))
                (ln,) = env.ax.plot(path[:, 0], path[:, 1],
                                    color=colors[name], linewidth=2)
                recorder.capture()
                for art in artists + [ln]:
                    art.remove()
            actions.append(a)
            total_cost += float(env.running_cost(state[None], a[None])[0])
            state = env.dynamics(state[None], a[None])[0]
            states.append(state)
        final_dist = float(jnp.linalg.norm(state - env.goal))
        smooth = float(jnp.abs(jnp.diff(jnp.stack(actions), axis=0)).sum())
        print(f"{name:<8s} {total_cost:>12.2f} {final_dist:>12.4f} {smooth:>12.3f}")
        if recorder is not None:
            print("saved:", recorder.save(f"{name.lower()}_evolution.gif", fps=8))
        if fig is not None:
            env.draw_trajectory(jnp.stack(states), color=colors[name], label=name)

    if fig is not None:
        env.ax.legend()
        print("saved:", env.save_figure("smooth_mppi_trajectories.png"))
