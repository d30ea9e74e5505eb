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

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def run_mppi_jit(mppi, plant_dynamics, x0, steps: int, running_cost=None):
    """Run an entire closed-loop control experiment as ONE jitted dispatch.

    TPU-native extension (no reference counterpart — the reference's loop
    crosses the host<->device boundary every step, ``mppi.py:876-898``): when
    the plant itself is a traceable JAX function (a simulated/learned plant
    rather than a gym env), the whole loop — solve, apply, advance — stays on
    the device and the host pays ONE round trip for the full experiment.

    With ``u_per_command > 1`` each solve returns a block of actions that is
    applied to the plant sequentially (reference mppi.py:271-275 semantics);
    ``steps`` counts *plant* steps and must be a multiple of ``u_per_command``.

    :param mppi: a controller built by this package (MPPI/SMPPI/KMPPI, or
        MPPI_Batched — the N-plant scenario batch runs the whole closed loop
        in one dispatch too, with per-plant cost accumulation)
    :param plant_dynamics: traceable fn(state (nx,), action (nu,)) -> next state;
        for a batched controller, fn((N, nx), (N, nu)) -> (N, nx) — any
        batch-capable dynamics (including the controller's own) qualifies.
        May differ from the controller's model (model-mismatch experiments)
    :param x0: (nx,) initial plant state — (N, nx) for a batched controller
    :param steps: number of plant steps
    :param running_cost: optional traceable fn(state, action) -> cost accumulated
        along the executed trajectory.  Defaults to the controller's running
        cost; for ``step_dependent_dynamics`` controllers the default receives
        the action's index within its solve block as the time argument.
    :returns: (states (steps+1, nx), actions (steps, nu), total_cost scalar);
        batched: (states (steps+1, N, nx), actions (steps, N, nu),
        total_cost (N,)).  The controller's internal state is advanced to the
        end of the run.
    """
    upc = int(mppi.u_per_command)
    if steps % upc != 0:
        raise ValueError(
            f"steps={steps} must be a multiple of u_per_command={upc}: each "
            f"solve commits a block of {upc} actions to the plant"
        )
    n_solves = steps // upc
    if running_cost is None:
        # the controller's own cost; resolve step-dependent signatures the same
        # way the solver factories do (ops/solve.py wrap_cost) so the default
        # path cannot TypeError on (state, u, t) costs
        from .ops.solve import wrap_cost

        _rc = wrap_cost(mppi.config, mppi.running_cost)
    else:
        _rc = lambda s, u, t: running_cost(s, u)
    fns = mppi._fns
    params = mppi._full_params() if hasattr(mppi, "_full_params") else mppi._params
    dtype = mppi.dtype
    from .ops.solve import BatchedState

    batched = isinstance(mppi._state, BatchedState)

    # cache the jitted loop per (plant, cost, steps, solver bundle) so repeated
    # episodes do not retrace the steps-length scan every call; the dynamics
    # params pytree is a TRACED argument (not baked into the closure), so
    # retraining and swapping mppi.dynamics_params takes effect immediately
    # with zero recompilation
    cache = mppi.__dict__.setdefault("_runner_cache", {})
    cache_key = (plant_dynamics, running_cost, int(steps), fns)
    loop = cache.get(cache_key)
    if loop is None:
        nu = mppi.nu
        if batched:
            N = mppi.N

            @jax.jit
            def loop(params, cstate, x, dyn_params):
                def body(carry, _):
                    cstate, x, acc = carry
                    cstate, a, _ = fns.step(params, cstate, x, dyn_params)
                    # (N, upc, nu) -> block-major so the plant applies one
                    # (N, nu) action row per plant step
                    a_block = jnp.moveaxis(a.reshape(N, upc, nu), 1, 0)

                    def apply_one(inner, inp):
                        x, acc = inner
                        a_j, j = inp
                        x_next = plant_dynamics(x, a_j)
                        acc = acc + _rc(x_next, a_j, j)
                        return (x_next, acc), (x_next, a_j)

                    (x, acc), (xs, actions) = jax.lax.scan(
                        apply_one, (x, acc), (a_block, jnp.arange(upc))
                    )
                    return (cstate, x, acc), (xs, actions)

                (cstate, x, acc), (xs, actions) = jax.lax.scan(
                    body, (cstate, x, jnp.zeros((N,), dtype)), None,
                    length=n_solves,
                )
                return (
                    cstate,
                    xs.reshape(steps, N, -1),
                    actions.reshape(steps, N, nu),
                    acc,
                )

        else:

            @jax.jit
            def loop(params, cstate, x, dyn_params):
                def body(carry, _):
                    cstate, x, acc = carry
                    cstate, a, _ = fns.step(params, cstate, x, None, dyn_params)
                    a_block = a.reshape(upc, nu)

                    def apply_one(inner, inp):
                        x, acc = inner
                        a_j, j = inp
                        x_next = plant_dynamics(x, a_j)
                        # post-dynamics cost convention, matching the
                        # controller's objective (see MPPI docstring /
                        # reference mppi.py:314-318)
                        acc = acc + _rc(x_next[None], a_j[None], j)[0]
                        return (x_next, acc), (x_next, a_j)

                    (x, acc), (xs, actions) = jax.lax.scan(
                        apply_one, (x, acc), (a_block, jnp.arange(upc))
                    )
                    return (cstate, x, acc), (xs, actions)

                (cstate, x, acc), (xs, actions) = jax.lax.scan(
                    body, (cstate, x, jnp.asarray(0.0, dtype)), None,
                    length=n_solves,
                )
                return cstate, xs.reshape(steps, -1), actions.reshape(steps, nu), acc

        cache[cache_key] = loop

    x0 = jnp.asarray(x0, dtype)
    cstate, xs, actions, total_cost = loop(params, mppi._state, x0, mppi.dynamics_params)
    mppi._state = cstate
    states = jnp.concatenate([x0[None], xs], axis=0)
    return states, actions, total_cost


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
