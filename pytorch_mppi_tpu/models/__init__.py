"""Built-in model families and example environments.

Covers the reference's example surface (SURVEY.md §1 L4): true-dynamics pendulum
(tests/pendulum.py), learned-MLP pendulum (tests/pendulum_approximate.py), and the
2D navigation environment (tests/smooth_mppi.py) — all as traceable JAX functions
plus dependency-free gym-style environments.
"""
from .mlp import (
    make_residual_dynamics,
    make_train_step,
    mlp_apply,
    mlp_init,
    train_epochs,
)
from .pendulum import (
    PendulumEnv,
    angle_normalize,
    pendulum_dynamics,
    pendulum_running_cost,
)
from .toy2d import (
    HillCost,
    LinearDeltaDynamics,
    LQRCost,
    ScaledLinearDynamics,
    Toy2DEnvironment,
)

__all__ = [
    "PendulumEnv",
    "pendulum_dynamics",
    "pendulum_running_cost",
    "angle_normalize",
    "Toy2DEnvironment",
    "LinearDeltaDynamics",
    "ScaledLinearDynamics",
    "LQRCost",
    "HillCost",
    "mlp_init",
    "mlp_apply",
    "make_residual_dynamics",
    "make_train_step",
    "train_epochs",
]
