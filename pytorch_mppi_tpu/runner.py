"""Closed-loop driver with online dynamics retraining.

Native equivalent of the reference ``run_mppi`` helper
(``/root/reference/src/pytorch_mppi/mppi.py:876-898``): gym-style loop that logs
per-command latency, collects a (state, action) ring-buffer dataset and invokes
``retrain_dynamics`` every ``retrain_after_iter`` steps for online model learning
(used by tests/pendulum_approximate.py:198).
"""
from __future__ import annotations

import logging
import time

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def run_mppi(mppi, env, retrain_dynamics, retrain_after_iter=50, iter=1000, render=True):
    """Run a closed-loop control experiment.

    :param mppi: a controller exposing ``command``/``nx``/``nu``
    :param env: gym-style env with ``unwrapped.state``, ``step``, ``render``
    :param retrain_dynamics: callable(dataset (R, nx+nu)) for online learning
    :returns: (total_reward, dataset)
    """
    dtype = mppi.dtype
    dataset = jnp.zeros((retrain_after_iter, mppi.nx + mppi.nu), dtype=dtype)
    total_reward = 0.0
    command_times = []
    for i in range(iter):
        state = np.array(env.unwrapped.state).copy()
        command_start = time.perf_counter()
        action = mppi.command(state)
        # block so logged latency reflects the full device round-trip; the env
        # boundary forces host transfer anyway (reference mppi.py:884)
        action_np = np.asarray(action)
        elapsed = time.perf_counter() - command_start
        command_times.append(elapsed)
        res = env.step(action_np)
        s, r = res[0], res[1]
        total_reward += r
        logger.debug(
            "action taken: %.4f cost received: %.4f time taken: %.5fs",
            float(np.ravel(action_np)[0]), -r, elapsed,
        )
        if render:
            env.render()

        di = i % retrain_after_iter
        if di == 0 and i > 0:
            retrain_dynamics(dataset)
            dataset = jnp.zeros_like(dataset)
        row = jnp.concatenate(
            [jnp.asarray(state, dtype).reshape(-1), jnp.asarray(action_np, dtype).reshape(-1)]
        )
        dataset = dataset.at[di].set(row)
    return total_reward, dataset
