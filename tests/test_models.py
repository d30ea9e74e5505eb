"""Tests for built-in model families, the closed-loop runner, and the
learned-dynamics (parameterized) path.

Covers the reference's example-driver behavior (SURVEY.md §1 L4, §3.5): pendulum
swing-up with true dynamics, online model learning via run_mppi, and the 2D
navigation environment.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI, run_mppi
from pytorch_mppi_tpu.models import (
    PendulumEnv,
    Toy2DEnvironment,
    angle_normalize,
    make_residual_dynamics,
    make_train_step,
    mlp_init,
    pendulum_dynamics,
    pendulum_running_cost,
    train_epochs,
)

SEED = 42


class TestPendulum:
    def test_swing_up_true_dynamics(self):
        """Flagship acceptance config (reference tests/pendulum.py: nx=2, nu=1,
        K=100, T=15, sigma=10, bounds +-2): swing up from hanging."""
        ctrl = MPPI(
            pendulum_dynamics, pendulum_running_cost, nx=2,
            noise_sigma=jnp.asarray(10.0, jnp.float64),
            num_samples=100, horizon=15, lambda_=1.0,
            u_min=jnp.asarray(-2.0), u_max=jnp.asarray(2.0), seed=SEED,
        )
        state = jnp.array([np.pi, 1.0], dtype=jnp.float64)
        angles = []
        for _ in range(120):
            a = ctrl.command(state)
            state = pendulum_dynamics(state[None], a[None])[0]
            angles.append(abs(float(angle_normalize(float(state[0])))))
        assert np.mean(angles[-20:]) < 0.3, f"no swing-up: tail angle {np.mean(angles[-20:])}"

    def test_run_mppi_loop(self):
        """run_mppi driver contract (reference mppi.py:876-898)."""
        env = PendulumEnv(downward_start=True)
        ctrl = MPPI(
            pendulum_dynamics, pendulum_running_cost, nx=2,
            noise_sigma=jnp.asarray(10.0, jnp.float64),
            num_samples=50, horizon=10, lambda_=1.0,
            u_min=jnp.asarray(-2.0), u_max=jnp.asarray(2.0), seed=SEED,
        )
        calls = []
        total_reward, dataset = run_mppi(
            ctrl, env, lambda ds: calls.append(ds.shape),
            retrain_after_iter=10, iter=25, render=False,
        )
        assert np.isfinite(total_reward)
        assert dataset.shape == (10, 3)  # nx + nu
        assert len(calls) == 2  # retrained at i=10 and i=20


class TestLearnedDynamics:
    def _collect(self, rng, n=512):
        states = jnp.asarray(rng.uniform(-np.pi, np.pi, (n, 1)))
        thdots = jnp.asarray(rng.uniform(-8, 8, (n, 1)))
        s = jnp.concatenate([states, thdots], axis=1)
        a = jnp.asarray(rng.uniform(-2, 2, (n, 1)))
        ns = pendulum_dynamics(s, a)
        return s, a, ns

    def test_training_reduces_error(self):
        rng = np.random.RandomState(SEED)
        batch = self._collect(rng)
        params = mlp_init(jax.random.PRNGKey(SEED), [3, 32, 32, 2], jnp.float64)
        train_step, init_opt = make_train_step(nx=2, angle_diff_dims=(0,))
        opt_state = init_opt(params)

        def val_err(p):
            s, a, ns = batch
            dyn = make_residual_dynamics(2, 1, u_clip=(-2, 2), angle_wrap_dims=(0,))
            pred = dyn(p, s, a)
            diff = pred - ns
            # angle-aware error on the wrapped dim (reference angular_diff_batch,
            # pendulum_approximate.py:89-94)
            diff = diff.at[:, 0].set(angle_normalize(diff[:, 0]))
            return float(jnp.mean(diff**2))

        err0 = val_err(params)
        params, opt_state, losses = train_epochs(train_step, params, opt_state, batch, 300)
        err1 = val_err(params)
        assert err1 < err0 * 0.1, f"training did not reduce error: {err0} -> {err1}"
        assert losses[-1] < losses[0]

    def test_mppi_with_learned_dynamics_and_online_swap(self):
        """Parameterized dynamics: weights are traced args; swapping them changes
        the solve without rebuilding (zero recompile)."""
        rng = np.random.RandomState(SEED)
        batch = self._collect(rng)
        params = mlp_init(jax.random.PRNGKey(SEED), [3, 32, 32, 2], jnp.float64)
        train_step, init_opt = make_train_step(nx=2, angle_diff_dims=(0,))
        opt_state = init_opt(params)
        trained, _, _ = train_epochs(train_step, params, opt_state, batch, 300)

        dyn = make_residual_dynamics(2, 1, u_clip=(-2, 2), angle_wrap_dims=(0,))
        ctrl = MPPI(
            dyn, pendulum_running_cost, nx=2,
            noise_sigma=jnp.asarray(5.0, jnp.float64),
            num_samples=100, horizon=10, lambda_=1.0,
            u_min=jnp.asarray(-2.0), u_max=jnp.asarray(2.0), seed=SEED,
            dynamics_params=params,
        )
        state = jnp.array([np.pi / 2, 0.0], dtype=jnp.float64)
        a_untrained = ctrl.command(state, shift_nominal_trajectory=False)
        ctrl.dynamics_params = trained  # online retrain swap
        a_trained = ctrl.command(state, shift_nominal_trajectory=False)
        assert a_untrained.shape == a_trained.shape == (1,)
        assert jnp.isfinite(a_trained).all()

    def test_online_learning_closed_loop(self):
        """End-to-end online model learning via run_mppi (reference
        pendulum_approximate.py:119-198 pattern), on the real pendulum env."""
        env = PendulumEnv(downward_start=True)
        params = mlp_init(jax.random.PRNGKey(SEED), [3, 32, 32, 2], jnp.float64)
        train_step, init_opt = make_train_step(nx=2, angle_diff_dims=(0,))
        opt_state = [init_opt(params)]
        dyn = make_residual_dynamics(2, 1, u_clip=(-2, 2), angle_wrap_dims=(0,))
        ctrl = MPPI(
            dyn, pendulum_running_cost, nx=2,
            noise_sigma=jnp.asarray(10.0, jnp.float64),
            num_samples=100, horizon=12, lambda_=1.0,
            u_min=jnp.asarray(-2.0), u_max=jnp.asarray(2.0), seed=SEED,
            dynamics_params=params,
        )

        # bootstrap with random actions (reference BOOT_STRAP_ITER pattern)
        rng = np.random.RandomState(SEED)
        ss, aa, nss = [], [], []
        s = np.array([np.pi, 1.0])
        for _ in range(100):
            a = rng.uniform(-2, 2, (1,))
            ns = np.asarray(pendulum_dynamics(jnp.asarray(s)[None], jnp.asarray(a)[None])[0])
            ss.append(s); aa.append(a); nss.append(ns)
            s = ns
        boot = (jnp.asarray(np.stack(ss)), jnp.asarray(np.stack(aa)), jnp.asarray(np.stack(nss)))
        new_params, new_opt, _ = train_epochs(train_step, ctrl.dynamics_params, opt_state[0], boot, 200)
        ctrl.dynamics_params = new_params
        opt_state[0] = new_opt

        def retrain(dataset):
            ds = np.asarray(dataset)
            s_, a_ = ds[:-1, :2], ds[:-1, 2:3]
            ns_ = ds[1:, :2]
            b = (jnp.asarray(s_), jnp.asarray(a_), jnp.asarray(ns_))
            p, o, _ = train_epochs(train_step, ctrl.dynamics_params, opt_state[0], b, 100)
            ctrl.dynamics_params = p
            opt_state[0] = o

        total_reward, _ = run_mppi(ctrl, env, retrain, retrain_after_iter=25,
                                   iter=60, render=False)
        assert np.isfinite(total_reward)


class TestToy2D:
    def test_env_and_mppi(self):
        env = Toy2DEnvironment(dtype=jnp.float64)
        ctrl = MPPI(
            env.dynamics, env.running_cost, nx=2,
            noise_sigma=jnp.eye(2, dtype=jnp.float64),
            num_samples=300, horizon=15, lambda_=1.0, seed=SEED,
            terminal_state_cost=env.terminal_cost,
        )
        state = jnp.asarray(env.start)
        for _ in range(25):
            a = ctrl.command(state)
            state = env.dynamics(state[None], a[None])[0]
        assert float(jnp.linalg.norm(state - env.goal)) < 1.5

    def test_env_step_api(self):
        env = Toy2DEnvironment(dtype=jnp.float64)
        obs, _ = env.reset()
        obs2, reward, term, trunc, _ = env.step(np.array([0.1, 0.1]))
        assert obs2.shape == (2,)
        assert np.isfinite(reward)

    def test_scaled_linear_dynamics(self):
        env = Toy2DEnvironment(dtype=jnp.float64)
        from pytorch_mppi_tpu.models import ScaledLinearDynamics
        B = jnp.array([[0.5, 0.0], [0.0, -0.5]], dtype=jnp.float64)
        dyn = ScaledLinearDynamics(env.running_cost, B)
        out = dyn(jnp.zeros((4, 2), jnp.float64), jnp.ones((4, 2), jnp.float64))
        assert out.shape == (4, 2)
        assert jnp.isfinite(out).all()


class TestDifferentiableClosedLoop:
    """The ENTIRE closed loop — plan with the learned model, execute on the
    true plant — is differentiable w.r.t. the model weights, so a dynamics
    model can be trained through TASK COST alone (no prediction-error
    supervision).  No reference counterpart: torch autograd cannot flow
    through the reference controller's RNG and in-place mutation."""

    def test_train_dynamics_through_control(self):
        import optax

        from pytorch_mppi_tpu.config import MPPIConfig, MPPIParams, MPPIState
        from pytorch_mppi_tpu.ops import solve as S
        from pytorch_mppi_tpu.models.mlp import mlp_init, make_residual_dynamics

        DT = jnp.float32
        B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
        goal = jnp.array([2.0, 2.0], DT)
        true_dyn = lambda s, a: s + a @ B.T
        cost = lambda s, a: ((goal - s) ** 2).sum(axis=-1)

        w = mlp_init(jax.random.PRNGKey(0), [4, 16, 2])
        model = make_residual_dynamics(2, 2)
        config = MPPIConfig(nx=2, nu=2, K=128, T=8, dtype=DT,
                            diag_sigma=True, parameterized_dynamics=True)
        fns = S.make_mppi_step(config, model, cost, jit=False)
        params = MPPIParams(
            noise_mu=jnp.zeros(2, DT), noise_sigma=jnp.eye(2, dtype=DT),
            lambda_=jnp.asarray(1.0, DT), u_min=jnp.full((2,), -1.0, DT),
            u_max=jnp.full((2,), 1.0, DT), u_init=jnp.zeros(2, DT),
        )

        def task_loss(w):
            st = MPPIState(U=jnp.zeros((8, 2), DT), key=jax.random.PRNGKey(7))
            x = jnp.array([-3.0, -2.0], DT)
            tot = 0.0
            for _ in range(6):
                st, a, _ = fns.step(params, st, x, None, w)  # plan: MODEL
                x = true_dyn(x[None], a[None])[0]            # execute: TRUTH
                tot = tot + ((goal - x) ** 2).sum()
            return tot

        opt = optax.adam(3e-3)
        opt_state = opt.init(w)
        vg = jax.jit(jax.value_and_grad(task_loss))
        l0, _ = vg(w)
        for _ in range(25):
            l, g = vg(w)
            updates, opt_state = opt.update(g, opt_state, w)
            w = optax.apply_updates(w, updates)
        assert np.isfinite(float(l))
        # measured: 370 -> ~55; assert a conservative 2x improvement
        assert float(l) < 0.5 * float(l0), f"{float(l)} vs initial {float(l0)}"
