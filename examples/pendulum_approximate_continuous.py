"""Pendulum swing-up with a learned model using the continuous (sin, cos) angle
representation — port of ``/root/reference/tests/pendulum_approximate_continuous.py``:
the network sees (sin th, cos th, thdot, u) instead of raw theta, removing the wrap
discontinuity from the learned function.

Run: python examples/pendulum_approximate_continuous.py
"""
import logging

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_mppi_tpu import MPPI, run_mppi
from pytorch_mppi_tpu.models import (
    PendulumEnv,
    angle_normalize,
    make_residual_dynamics,
    make_train_step,
    mlp_init,
    pendulum_dynamics,
    pendulum_running_cost,
    train_epochs,
)

logging.basicConfig(level=logging.INFO,
                    format="[%(levelname)s %(asctime)s %(pathname)s:%(lineno)d] %(message)s",
                    datefmt="%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)

if __name__ == "__main__":
    TIMESTEPS = 30
    N_SAMPLES = 1000
    ACTION_LOW, ACTION_HIGH = -2.0, 2.0
    H_UNITS = 32
    TRAIN_EPOCH = 150
    BOOT_STRAP_ITER = 100
    DTYPE = jnp.float32
    randseed = 25

    nx, nu = 2, 1
    # input: sin th, cos th, thdot, u  (reference pendulum_approximate_continuous.py:68-70)
    params = mlp_init(jax.random.PRNGKey(randseed), [nx + 1 + nu, H_UNITS, H_UNITS, nx], DTYPE)
    dynamics = make_residual_dynamics(
        nx, nu, u_clip=(ACTION_LOW, ACTION_HIGH),
        angle_wrap_dims=(0,), angle_encode_dims=(0,),
    )
    train_step, init_opt = make_train_step(
        nx=nx, angle_diff_dims=(0,), angle_encode_dims=(0,)
    )
    opt_state = init_opt(params)

    rng = np.random.RandomState(randseed)
    Nv = 1000
    statev = jnp.asarray(np.concatenate([
        (rng.rand(Nv, 1) - 0.5) * 2 * np.pi, (rng.rand(Nv, 1) - 0.5) * 16], axis=1), DTYPE)
    actionv = jnp.asarray((rng.rand(Nv, 1) - 0.5) * (ACTION_HIGH - ACTION_LOW), DTYPE)

    def val_error(p):
        pred = dynamics(p, statev, actionv)
        true = pendulum_dynamics(statev, actionv)
        diff = pred - true
        diff = diff.at[:, 0].set(angle_normalize(diff[:, 0]))
        return float(jnp.mean(jnp.linalg.norm(diff, axis=1)))

    env = PendulumEnv(downward_start=True, seed=randseed)
    ctrl = MPPI(
        dynamics, pendulum_running_cost, nx=nx,
        noise_sigma=jnp.asarray(1.0, DTYPE),
        num_samples=N_SAMPLES, horizon=TIMESTEPS, lambda_=1.0,
        u_min=jnp.asarray(ACTION_LOW), u_max=jnp.asarray(ACTION_HIGH),
        seed=randseed, dynamics_params=params,
    )

    dataset = [None]

    def train(new_data):
        nd = np.asarray(new_data).copy()
        nd[:, 0] = angle_normalize(nd[:, 0])
        nd[:, -1] = np.clip(nd[:, -1], ACTION_LOW, ACTION_HIGH)
        dataset[0] = nd if dataset[0] is None else np.concatenate([dataset[0], nd], 0)
        XU = dataset[0]
        b = (jnp.asarray(XU[:-1, :nx], DTYPE), jnp.asarray(XU[:-1, nx:], DTYPE),
             jnp.asarray(XU[1:, :nx], DTYPE))
        o = init_opt(ctrl.dynamics_params)
        p, _, _ = train_epochs(train_step, ctrl.dynamics_params, o, b, TRAIN_EPOCH)
        ctrl.dynamics_params = p
        logger.info("ds %d; val error %.4f", XU.shape[0], val_error(p))

    new_data = np.zeros((BOOT_STRAP_ITER, nx + nu))
    s = np.array(env.state)
    for i in range(BOOT_STRAP_ITER):
        a = rng.uniform(ACTION_LOW, ACTION_HIGH)
        new_data[i, :nx] = s
        new_data[i, nx:] = a
        s = np.asarray(pendulum_dynamics(jnp.asarray(s, DTYPE)[None],
                                         jnp.asarray([a], DTYPE)[None])[0])
    train(new_data)
    env.reset()

    total_reward, _ = run_mppi(ctrl, env, train, retrain_after_iter=50,
                               iter=1000, render=False)
    theta = float(angle_normalize(env.state[0]))
    logger.info("Total reward %f; final angle %.4f rad", total_reward, theta)
    print(f"RESULT total_reward={total_reward:.2f} final_angle={theta:.4f} "
          f"val_error={val_error(ctrl.dynamics_params):.4f}")
