"""Pendulum swing-up with true dynamics — port of the reference flagship example
(``/root/reference/tests/pendulum.py``): nx=2, nu=1, K=100, T=15, sigma=10,
bounds +-2, run through the ``run_mppi`` closed-loop driver.

Run: python examples/pendulum.py  (add JAX_PLATFORMS=cpu for CPU)
"""
import logging

import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import MPPI, run_mppi
from pytorch_mppi_tpu.models import (
    PendulumEnv,
    angle_normalize,
    pendulum_dynamics,
    pendulum_running_cost,
)

logging.basicConfig(level=logging.INFO,
                    format="[%(levelname)s %(asctime)s %(pathname)s:%(lineno)d] %(message)s",
                    datefmt="%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)

if __name__ == "__main__":
    TIMESTEPS = 15  # T
    N_SAMPLES = 100  # K
    ACTION_LOW, ACTION_HIGH = -2.0, 2.0

    noise_sigma = jnp.asarray(10.0, jnp.float32)

    # use gymnasium's Pendulum-v1 when available (the reference's env,
    # tests/pendulum.py:68-72), else the built-in dependency-free env
    try:
        import gymnasium as gym
        import numpy as _np

        env = gym.make("Pendulum-v1").unwrapped
        env.reset()
        env.state = _np.array([_np.pi, 1.0])  # downward start
        print("using gymnasium Pendulum-v1")
    except ImportError:
        env = PendulumEnv(downward_start=True)

    ctrl = MPPI(
        pendulum_dynamics, pendulum_running_cost, nx=2, noise_sigma=noise_sigma,
        num_samples=N_SAMPLES, horizon=TIMESTEPS, lambda_=1.0,
        u_min=jnp.asarray(ACTION_LOW), u_max=jnp.asarray(ACTION_HIGH), seed=7,
    )
    total_reward, _ = run_mppi(ctrl, env, lambda ds: None, iter=200, render=False)
    theta = float(angle_normalize(env.state[0]))
    logger.info("Total reward %f; final angle %.4f rad", total_reward, theta)
    print(f"RESULT total_reward={total_reward:.2f} final_angle={theta:.4f}")
