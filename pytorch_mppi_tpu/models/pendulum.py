"""Pendulum swing-up: true dynamics, costs, and a dependency-free environment.

The reference uses gym's Pendulum-v1 with hand-written true dynamics
(``/root/reference/tests/pendulum.py:30-60``, ``tests/pendulum_approximate.py:69-86``)
as its flagship closed-loop acceptance target (BASELINE.json configs).  This module
provides the same physics as traceable JAX functions plus a tiny gym-compatible
environment so the examples run with zero external deps (gymnasium is optional).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

G = 10.0
M = 1.0
L = 1.0
DT = 0.05
ACTION_LOW = -2.0
ACTION_HIGH = 2.0
MAX_SPEED = 8.0


def angle_normalize(x):
    """((x + pi) mod 2pi) - pi  (reference tests/pendulum.py:51-52)."""
    return ((x + math.pi) % (2 * math.pi)) - math.pi


def pendulum_dynamics(state, action):
    """True gym pendulum dynamics on (K, 2) states / (K, 1) actions
    (reference tests/pendulum.py:30-48)."""
    th = state[:, 0:1]
    thdot = state[:, 1:2]
    u = jnp.clip(action[:, 0:1], ACTION_LOW, ACTION_HIGH)
    newthdot = thdot + (3 * G / (2 * L) * jnp.sin(th) + 3.0 / (M * L**2) * u) * DT
    newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
    newth = th + newthdot * DT
    return jnp.concatenate((newth, newthdot), axis=1)


def pendulum_running_cost(state, action):
    """angle^2 + 0.1 thdot^2 (reference tests/pendulum.py:55-60)."""
    theta = state[:, 0]
    theta_dt = state[:, 1]
    return angle_normalize(theta) ** 2 + 0.1 * theta_dt**2


class PendulumEnv:
    """Minimal gym-style pendulum environment (reward = -cost of gym Pendulum-v1).

    API-compatible with what ``run_mppi`` consumes (reference mppi.py:876-898):
    ``unwrapped.state``, ``step(action) -> (obs, reward, ...)``, ``reset``,
    ``render`` (no-op).
    """

    def __init__(self, downward_start: bool = True, seed: int = 0):
        self._rng = np.random.RandomState(seed)
        self.downward_start = downward_start
        self.state = None
        self.reset()

    @property
    def unwrapped(self):
        return self

    def reset(self):
        if self.downward_start:
            self.state = np.array([np.pi, 1.0])
        else:
            self.state = np.array(
                [self._rng.uniform(-np.pi, np.pi), self._rng.uniform(-1, 1)]
            )
        return self._obs(), {}

    def _obs(self):
        th, thdot = self.state
        return np.array([np.cos(th), np.sin(th), thdot])

    def step(self, action):
        u = float(np.clip(np.ravel(np.asarray(action))[0], ACTION_LOW, ACTION_HIGH))
        th, thdot = self.state
        cost = float(angle_normalize(th)) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (3 * G / (2 * L) * np.sin(th) + 3.0 / (M * L**2) * u) * DT
        newthdot = np.clip(newthdot, -MAX_SPEED, MAX_SPEED)
        newth = th + newthdot * DT
        self.state = np.array([newth, newthdot])
        return self._obs(), -cost, False, False, {}

    def render(self):
        pass
