"""Behavioral surface on the real TPU chip, float32.

The f32-on-TPU re-run of the core behavioral contracts from
``tests/test_mppi.py`` (themselves ported from the reference's
``tests/test_mppi.py``): same fixtures, tolerances widened from f64-CPU to
f32-Mosaic where a numeric comparison is involved.  Every test here executes
compiled XLA/Mosaic programs on the chip — nothing runs on the host backend.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import KMPPI, MPPI, MPPI_Batched, SMPPI, run_mppi_jit

DT = jnp.float32
SEED = 42

B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DT)
GOAL = jnp.array([2.0, 2.0], dtype=DT)


def dyn(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def terminal(states, actions):
    return 10.0 * ((GOAL - states[..., -1, :]) ** 2).sum(axis=-1)


def _ctrl(cls=MPPI, **kw):
    base = dict(num_samples=128, horizon=8, lambda_=1.0, seed=SEED)
    base.update(kw)
    return cls(dyn, cost, 2, jnp.eye(2, dtype=DT), **base)


START = jnp.array([-3.0, -2.0], dtype=DT)


class TestCore:
    def test_action_shape_dtype(self):
        a = _ctrl().command(START)
        assert a.shape == (2,)
        assert a.dtype == DT

    def test_cost_decreases_over_steps(self):
        ctrl = _ctrl(num_samples=256, horizon=10)
        s = START
        first = float(cost(s[None], jnp.zeros((1, 2), DT))[0])
        for _ in range(8):
            a = ctrl.command(s)
            s = dyn(s, a)
        last = float(cost(s[None], jnp.zeros((1, 2), DT))[0])
        assert last < first

    def test_seeded_determinism_on_chip(self):
        """Same seed -> bit-identical actions from two controllers, compiled
        Mosaic on the real device."""
        a1 = _ctrl().command(START)
        a2 = _ctrl().command(START)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_bounds_enforced(self):
        ctrl = _ctrl(u_min=jnp.array([-0.5, -0.5], DT),
                     u_max=jnp.array([0.5, 0.5], DT))
        for _ in range(3):
            a = ctrl.command(START)
            assert (np.abs(np.asarray(a)) <= 0.5 + 1e-6).all()
            pert = np.asarray(ctrl.perturbed_action)
            assert (pert <= 0.5 + 1e-6).all() and (pert >= -0.5 - 1e-6).all()

    def test_symmetric_bound_completion(self):
        ctrl = _ctrl(u_max=0.75)
        np.testing.assert_allclose(np.asarray(ctrl.u_min), [-0.75, -0.75])

    def test_terminal_cost_and_lazy_storage(self):
        plain = _ctrl()
        plain.command(START)
        assert plain.states is None  # lazy-storage contract
        term = _ctrl(terminal_state_cost=terminal)
        term.command(START)
        assert term.states is not None
        assert term.states.shape[0] == 1  # M=1

    def test_step_dependent_dynamics(self):
        def dyn_t(state, action, t):
            return state + action @ B.T * (1.0 + 0.0 * t)

        def cost_t(state, action, t):
            return cost(state, action)

        ctrl = MPPI(dyn_t, cost_t, 2, jnp.eye(2, dtype=DT), num_samples=128,
                    horizon=8, seed=SEED, step_dependent_dynamics=True)
        assert np.isfinite(np.asarray(ctrl.command(START))).all()

    def test_noise_abs_cost(self):
        a = _ctrl(noise_abs_cost=True).command(START)
        assert np.isfinite(np.asarray(a)).all()

    def test_sample_null_action(self):
        ctrl = _ctrl(sample_null_action=True)
        ctrl.command(START)
        np.testing.assert_array_equal(
            np.asarray(ctrl.perturbed_action[0]), 0.0)

    def test_u_per_command(self):
        a = _ctrl(u_per_command=3).command(START)
        assert a.shape == (3, 2)

    def test_rollout_samples_var_cost(self):
        ctrl = _ctrl(rollout_samples=3, rollout_var_cost=0.1,
                     stochastic_dynamics=True)
        # stochastic wrapper: dynamics takes a key
        ctrl2 = MPPI(lambda s, a, k: dyn(s, a) + 0.01 * jax.random.normal(
                         k, s.shape, DT),
                     cost, 2, jnp.eye(2, dtype=DT), num_samples=64, horizon=6,
                     seed=SEED, rollout_samples=3, rollout_var_cost=0.1,
                     stochastic_dynamics=True)
        a = ctrl2.command(START)
        assert np.isfinite(np.asarray(a)).all()
        assert ctrl2.states.shape[0] == 3

    def test_get_rollouts(self):
        ctrl = _ctrl()
        ctrl.command(START)
        r = ctrl.get_rollouts(START, num_rollouts=5)
        assert r.shape == (5, 8, 2)
        assert np.isfinite(np.asarray(r)).all()

    def test_change_horizon_both_ways(self):
        ctrl = _ctrl(horizon=8)
        ctrl.command(START)
        ctrl.change_horizon(12)
        assert ctrl.U.shape == (12, 2)
        assert np.isfinite(np.asarray(ctrl.command(START))).all()
        ctrl.change_horizon(5)
        assert ctrl.U.shape == (5, 2)
        assert np.isfinite(np.asarray(ctrl.command(START))).all()

    def test_reset_resamples(self):
        ctrl = _ctrl()
        U1 = np.asarray(ctrl.U)
        ctrl.reset()
        assert not np.allclose(U1, np.asarray(ctrl.U))

    def test_batch_state_input(self):
        ctrl = _ctrl(num_samples=64)
        x0 = jnp.broadcast_to(START, (64, 2))
        a = ctrl.command(x0)
        assert a.shape == (2,)

    def test_omega_sums_to_one(self):
        ctrl = _ctrl()
        ctrl.command(START)
        assert float(jnp.sum(ctrl.omega)) == pytest.approx(1.0, abs=1e-5)
        assert ctrl.cost_total.shape == (128,)

    def test_scalar_sigma_1d_control(self):
        ctrl = MPPI(lambda s, a: s + jnp.pad(a, ((0, 0), (0, 1))), cost, 2,
                    jnp.asarray(0.5, DT), num_samples=64, horizon=6, seed=SEED)
        a = ctrl.command(START)
        assert a.shape == (1,)

    def test_u_scale_unscaled_storage(self):
        ctrl = _ctrl(u_scale=2.0, u_max=0.5)
        a = ctrl.command(START)
        assert (np.abs(np.asarray(ctrl.U)) <= 0.5 + 1e-6).all()

    def test_shift_semantics(self):
        ctrl = _ctrl()
        ctrl.command(START)
        U1 = np.asarray(ctrl.U)
        a = ctrl.command(START, shift_nominal_trajectory=False)
        # no-shift solve does not roll the sequence before updating
        assert np.isfinite(np.asarray(a)).all()
        ctrl.shift_nominal_trajectory()
        np.testing.assert_array_equal(np.asarray(ctrl.U[-1]),
                                      np.asarray(ctrl.u_init))

    def test_num_iterations_on_chip(self):
        a = _ctrl(num_iterations=3).command(START)
        assert np.isfinite(np.asarray(a)).all()

    def test_run_mppi_jit_one_dispatch(self):
        ctrl = _ctrl(num_samples=64, horizon=6)
        states, actions, total = run_mppi_jit(ctrl, dyn, START, steps=10)
        assert states.shape == (11, 2) and actions.shape == (10, 2)
        assert np.isfinite(float(total))


class TestVariantsOnChip:
    def test_smppi(self):
        ctrl = _ctrl(SMPPI, u_min=jnp.array([-1.0, -1.0], DT),
                     u_max=jnp.array([1.0, 1.0], DT),
                     action_min=jnp.array([-1.0, -1.0], DT),
                     action_max=jnp.array([1.0, 1.0], DT),
                     w_action_seq_cost=2.0)
        s = START
        for _ in range(5):
            a = ctrl.command(s)
            s = dyn(s, a)
        assert np.isfinite(np.asarray(s)).all()

    def test_kmppi(self):
        ctrl = _ctrl(KMPPI, num_support_pts=4)
        s = START
        for _ in range(5):
            a = ctrl.command(s)
            s = dyn(s, a)
        assert np.isfinite(np.asarray(s)).all()
        assert ctrl.theta.shape == (4, 2)

    def test_batched(self):
        ctrl = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=4,
                            num_samples=64, horizon=6, seed=SEED)
        x0 = jnp.stack([START, START * 0.5, -START, START * 2.0])
        a = ctrl.command(x0)
        assert a.shape == (4, 2)
        # independent plants get different actions
        assert not np.allclose(np.asarray(a[0]), np.asarray(a[2]))

    def test_gradient_refinement_composes_with_fused_kernel(self):
        """use_pallas=True + gradient_refinement_steps: the descent is plain
        XLA autodiff applied to the fused kernel's returned U, so the two
        compose in one dispatch on-chip (docs/DESIGN.md §10).  At a starved
        K the refined controller must track markedly tighter."""
        u_max = jnp.array([1.0, 1.0], DT)

        def run(steps):
            ctrl = _ctrl(num_samples=16, horizon=8, u_max=u_max,
                         use_pallas=True, gradient_refinement_steps=steps,
                         gradient_refinement_lr=0.1)
            s = START
            for _ in range(10):
                a = ctrl.command(s)
                s = dyn(s, a)
            return float(jnp.linalg.norm(GOAL - s)), ctrl

        d_base, _ = run(0)
        d_ref, ctrl = run(20)
        assert np.isfinite(d_ref)
        assert d_ref < d_base + 1e-6, (d_ref, d_base)
        # the refined nominal respects bounds by construction
        assert float(jnp.max(jnp.abs(ctrl.U))) <= 1.0 + 1e-5


class TestCrossBackend:
    """f32 numerics pinned against the CPU backend in the same process: the
    identical traced program on both backends must agree to f32 tolerance
    (catches Mosaic lowering / TPU-layout regressions the CPU lane cannot)."""

    def test_solve_matches_cpu_f32(self):
        cpu = jax.devices("cpu")[0]
        # force threefry on both sides: the auto default picks the TPU
        # hardware generator ('rbg'), whose stream has no CPU equivalent
        a_tpu = _ctrl(num_samples=64, horizon=6, prng_impl=None).command(START)
        with jax.default_device(cpu):
            a_cpu = _ctrl(num_samples=64, horizon=6, prng_impl=None).command(START)
        # identical noise draws (diag fast path is backend-bit-identical);
        # residual divergence comes from the TPU's bf16-input matmul precision
        # in the rollout accumulating through the softmax
        np.testing.assert_allclose(
            np.asarray(a_tpu), np.asarray(a_cpu), rtol=5e-3, atol=5e-4
        )

    def test_cpu_placed_controller_with_use_pallas_falls_back(self):
        """device='cpu' + use_pallas=True on a TPU host: the global backend
        is 'tpu' but the controller's params live on CPU — the fused kernel
        must NOT be built (it would compile interpret=False for the CPU
        backend and crash at the first command; round-3 review finding)."""
        cpu = jax.devices("cpu")[0]
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=2048,
                    horizon=5, seed=3, device="cpu", use_pallas=True)
        a = ctrl.command(jnp.zeros(2, DT))
        assert a.devices() == {cpu}
        assert ctrl.noise is not None  # XLA path ran (artifacts materialized)
        b = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=2,
                         num_samples=2048, horizon=5, seed=3, device="cpu",
                         use_pallas=True)
        actions = b.command(jnp.zeros((2, 2), DT))
        assert actions.devices() == {cpu}

    def test_cpu_placed_batched_controller_stays_on_cpu(self):
        """A device='cpu' MPPI_Batched on a TPU host must compute on CPU
        (VERDICT round-2 weak #3: params were never device_put, so the solve
        silently ran on TPU)."""
        cpu = jax.devices("cpu")[0]
        ctrl = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=2,
                            num_samples=32, horizon=4, seed=SEED, device="cpu")
        for leaf in jax.tree_util.tree_leaves(ctrl._params):
            assert leaf.devices() == {cpu}
        action = ctrl.command(jnp.zeros((2, 2), DT))
        assert action.devices() == {cpu}
        # threefry (the CPU-stream default) selected, not the TPU hardware PRNG
        assert ctrl.prng_impl is None

    def test_weighting_matches_cpu(self):
        from pytorch_mppi_tpu.ops.solve import compute_weighting

        c = jnp.linspace(0.0, 30.0, 512, dtype=DT)
        _, om_tpu = jax.jit(compute_weighting, static_argnums=2)(c, jnp.asarray(1.0, DT), -1)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            _, om_cpu = jax.jit(compute_weighting, static_argnums=2)(
                jax.device_put(c, cpu), jnp.asarray(1.0, DT), -1)
        np.testing.assert_allclose(
            np.asarray(om_tpu), np.asarray(om_cpu), rtol=1e-5, atol=1e-7
        )


class TestEliteReuseOnChip:
    def test_elites_close_loop_on_chip(self):
        """Elite reuse (num_elites, iCEM-style) on the real chip: the loop
        converges and the stored elites refresh to the per-solve top-k."""
        ctrl = _ctrl(num_samples=64, num_elites=4,
                     u_min=-jnp.ones(2, DT), u_max=jnp.ones(2, DT))
        x = START
        for _ in range(15):
            a = ctrl.command(x)
            x = dyn(x, a)
        assert float(jnp.linalg.norm(GOAL - x)) < 1.0
        idx = np.argsort(np.asarray(ctrl.cost_total))[:4]
        def rowset(a):
            # whole-trajectory row set (per-element sort could false-pass
            # on cross-mixed trajectories)
            f = np.asarray(a).reshape(np.shape(a)[0], -1)
            return f[np.lexsort(f.T[::-1])]

        np.testing.assert_array_equal(
            rowset(ctrl.perturbed_action[idx]),
            rowset(ctrl._state.elites))

    def test_use_pallas_with_elites_falls_back_without_artifacts(self):
        """num_elites WITHOUT fused_artifacts is ineligible (the top-k
        refresh needs the materialized perturbed set): use_pallas=True must
        fall back to the XLA scan path instead of silently dropping rows."""
        ctrl = _ctrl(num_samples=64, num_elites=2, use_pallas=True)
        a = ctrl.command(START)
        assert jnp.isfinite(a).all()
        # the fused kernel never materializes these; the XLA fallback always does
        assert ctrl.noise is not None
        assert ctrl.perturbed_action is not None
        assert ctrl._state.elites.shape == (2, 8, 2)

    def test_use_pallas_with_elites_and_artifacts_stays_fused(self, caplog):
        """num_elites + fused_artifacts composes with the transposed kernel
        (round 5): the shifted elites ride a (D, 128) operand into block 0,
        the refresh reads the kernel's materialized perturbed set, and the
        stored elites are exactly the cycle's top-k rows."""
        import logging

        with caplog.at_level(logging.INFO):
            ctrl = _ctrl(num_samples=64, num_elites=4, use_pallas=True,
                         fused_artifacts=True,
                         u_min=-jnp.ones(2, DT), u_max=jnp.ones(2, DT))
        assert any("transposed" in r.message for r in caplog.records
                   if r.levelno == logging.INFO), caplog.records
        x = START
        for _ in range(15):
            a = ctrl.command(x)
            x = dyn(x, a)
        assert float(jnp.linalg.norm(GOAL - x)) < 1.0
        idx = np.argsort(np.asarray(ctrl.cost_total))[:4]

        def rowset(a):
            f = np.asarray(a).reshape(np.shape(a)[0], -1)
            return f[np.lexsort(f.T[::-1])]

        np.testing.assert_array_equal(
            rowset(ctrl.perturbed_action[idx]),
            rowset(ctrl._state.elites))
        # next command: the shifted stored elites occupy rows [0, 4)
        prev = ctrl._state.elites
        from pytorch_mppi_tpu.ops.solve import _shift_elites
        expected = jnp.clip(
            _shift_elites(prev, ctrl._params.u_init), -1.0, 1.0)
        ctrl.command(x)
        np.testing.assert_allclose(
            np.asarray(ctrl.perturbed_action[:4]), np.asarray(expected),
            rtol=1e-6, atol=1e-7)
