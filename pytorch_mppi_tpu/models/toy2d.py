"""2D navigation environment: linear-delta dynamics, LQR + Gaussian-hill costs.

Native port of the example environment classes used by the reference's
SMPPI/KMPPI comparison driver (``/root/reference/tests/smooth_mppi.py:30-115`` and
``tests/auto_tune_parameters.py:50-100``), which the reference builds on
``arm_pytorch_utilities`` helpers.  Visualization is optional (matplotlib-gated).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.batch import batch_quadratic_product, handle_batch_input


class LinearDeltaDynamics:
    """x' = x + B u  (smooth_mppi.py:30-37)."""

    def __init__(self, B):
        self.B = jnp.asarray(B)

    @handle_batch_input(n=2)
    def __call__(self, state, action):
        return state + action @ self.B.T


class ScaledLinearDynamics:
    """x' = x + B u / log(cost(x) + 1e-8) * 2  (smooth_mppi.py:40-47)."""

    def __init__(self, cost, B):
        self.B = jnp.asarray(B)
        self.cost = cost

    @handle_batch_input(n=2)
    def __call__(self, state, action):
        scale = jnp.log(self.cost(state) + 1e-8).reshape(-1, 1)
        return state + action @ self.B.T / scale * 2


class LQRCost:
    """dx^T Q dx + u^T R u toward a goal (smooth_mppi.py:50-62)."""

    def __init__(self, Q, R, goal):
        self.Q = jnp.asarray(Q)
        self.R = jnp.asarray(R)
        self.goal = jnp.asarray(goal)

    @handle_batch_input(n=2)
    def __call__(self, state, action=None):
        dx = self.goal - state
        c = batch_quadratic_product(dx, self.Q)
        if action is not None:
            c = c + batch_quadratic_product(action, self.R)
        return c


class HillCost:
    """Gaussian cost hill: c0 * exp(-(x-c)^T Q (x-c))  (smooth_mppi.py:65-76)."""

    def __init__(self, Q, center, cost_at_center=1.0):
        self.Q = jnp.asarray(Q)
        self.center = jnp.asarray(center)
        self.cost_at_center = cost_at_center

    @handle_batch_input(n=2)
    def __call__(self, state, action=None):
        dx = self.center - state
        d = batch_quadratic_product(dx, self.Q)
        return self.cost_at_center * jnp.exp(-d)


class Toy2DEnvironment:
    """Dependency-free 2D navigation task (smooth_mppi.py:79-200): LQR goal cost
    plus a repulsive hill, linear-delta dynamics, optional terminal scaling."""

    def __init__(
        self,
        start=None,
        goal=None,
        dtype=jnp.float32,
        evaluate_running_cost=True,
        terminal_scale=100.0,
        r=0.01,
        visualize=False,
    ):
        self.dtype = dtype
        self.nx = 2
        self.state_ranges = [(-5, 5), (-5, 5)]
        self.evaluate_running_cost = evaluate_running_cost
        self.visualize = visualize

        self.start = (
            jnp.asarray(start, dtype) if start is not None else jnp.array([-3.0, -2.0], dtype)
        )
        self.goal = (
            jnp.asarray(goal, dtype) if goal is not None else jnp.array([2.0, 2.0], dtype)
        )
        self.state = self.start

        eye = jnp.eye(2, dtype=dtype)
        self.costs = [LQRCost(eye, eye * r, self.goal)]
        # a cost "hill" for difficulty (smooth_mppi.py:106-108)
        self.costs.append(
            HillCost(
                jnp.array([[0.1, 0.05], [0.05, 0.1]], dtype) * 2.5,
                jnp.array([-0.5, -1.0], dtype),
                cost_at_center=200.0,
            )
        )
        B = jnp.array([[0.5, 0.0], [0.0, -0.5]], dtype)
        self.dynamics = LinearDeltaDynamics(B)
        self.terminal_scale = terminal_scale

    def running_cost(self, state, action=None):
        c = None
        for cost in self.costs:
            ci = cost(state, action)
            c = ci if c is None else c + ci
        return c

    def terminal_cost(self, states, actions):
        """Scaled terminal cost on the last state (smooth_mppi.py pattern)."""
        return self.terminal_scale * self.running_cost(states[..., -1, :])

    # -- visualization (reference smooth_mppi.py:127-235; PNG output instead of
    #    interactive windows so it runs headless) ------------------------------

    def start_visualization(self):
        """Create the cost-landscape figure (matplotlib required)."""
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        self._plt = plt
        self.fig, self.ax = plt.subplots(figsize=(7, 7))
        self.ax.set_aspect("equal")
        self.ax.set(xlim=self.state_ranges[0], ylim=self.state_ranges[1])
        self.draw_costs()
        self.ax.scatter([float(self.start[0])], [float(self.start[1])],
                        color="tab:blue", label="start")
        self.ax.scatter([float(self.goal[0])], [float(self.goal[1])],
                        color="tab:green", label="goal")
        self.ax.legend()
        return self.fig

    def draw_costs(self, resolution=0.1):
        """Contour plot of the running-cost landscape (smooth_mppi.py:209-235)."""
        xs = np.arange(*self.state_ranges[0], resolution)
        ys = np.arange(*self.state_ranges[1], resolution)
        XX, YY = np.meshgrid(xs, ys)
        pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], axis=1), self.dtype)
        val = np.asarray(self.running_cost(pts)).reshape(XX.shape)
        c = self.ax.contourf(
            XX, YY, val,
            levels=[2, 4, 8, 16, 24, 32, 40, 50, 60, 80, 100, 150, 200, 250],
            cmap="Greys",
        )
        self.ax.contour(XX, YY, val, levels=c.levels, colors="k",
                        linestyles="dashed", linewidths=0.5)
        return c

    def draw_rollouts(self, rollouts, color="skyblue"):
        """Overlay candidate rollouts (smooth_mppi.py:199-208)."""
        for rollout in np.asarray(rollouts):
            r = np.concatenate([np.asarray(self.start)[None], rollout], axis=0)
            self.ax.plot(r[:, 0], r[:, 1], color=color, linewidth=0.8)
            self.ax.scatter(r[-1, 0], r[-1, 1], color="tab:red", s=8)

    def draw_trajectory(self, states, color="tab:orange", label=None):
        s = np.asarray(states)
        self.ax.plot(s[:, 0], s[:, 1], color=color, linewidth=2, label=label)

    def save_figure(self, path):
        self.fig.savefig(path, dpi=120, bbox_inches="tight")
        return path

    def reset(self):
        self.state = self.start
        return np.asarray(self.state), {}

    def step(self, action):
        state = self.state.reshape(1, -1)
        action = jnp.asarray(action, self.dtype).reshape(1, -1)
        cost = float(self.running_cost(state, action)[0])
        self.state = self.dynamics(state, action)[0]
        return np.asarray(self.state), -cost, False, False, {}

    @property
    def unwrapped(self):
        return self

    def render(self):
        pass
