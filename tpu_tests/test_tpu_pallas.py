"""Compiled (Mosaic) Pallas kernel tests on the real TPU chip.

The CPU lane can only run these kernels in interpreter mode
(``ops/pallas_rollout.py`` auto-selects); this lane pins the actual Mosaic
lowering: the fused rollout+weighting kernels and the fully-fused solve with
in-kernel hardware PRNG, against the XLA scan path on the same chip.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI
from pytorch_mppi_tpu.config import MPPIConfig
from pytorch_mppi_tpu.ops import pallas_rollout as PR
from pytorch_mppi_tpu.ops import solve as S

DT = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DT)
GOAL = jnp.array([2.0, 2.0], dtype=DT)


def dyn(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


class TestCompiledKernels:
    def test_pallas_rollout_matches_scan_compiled(self):
        """`use_pallas='rollout'` on the chip (interpret=False): the legacy
        fused rollout + flash-softmax path shares the XLA noise stream, so it
        must match the scan path to f32 tolerance over a multi-step loop."""
        assert not PR._interpret(), "must run compiled on the TPU backend"
        kw = dict(num_samples=256, horizon=8, lambda_=1.0, seed=3)
        c_ref = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), **kw)
        c_pal = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas="rollout",
                     **kw)
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(3):
            a1 = c_ref.command(state)
            a2 = c_pal.command(state)
            np.testing.assert_allclose(
                np.asarray(a1), np.asarray(a2), rtol=5e-3, atol=5e-4
            )
            # re-sync the nominal trajectory so per-step f32 kernel-vs-XLA
            # rounding (different matmul associations) does not compound
            # chaotically across steps — each step is compared fresh
            c_pal.U = c_ref.U
        np.testing.assert_allclose(
            np.asarray(c_ref.omega), np.asarray(c_pal.omega), rtol=1e-3,
            atol=1e-6,
        )

    def test_transposed_fused_closed_loop(self):
        """`use_pallas=True` routes to the transposed K-on-lanes fused kernel
        (in-kernel hardware PRNG — its own noise stream, so the comparison is
        behavioral): the closed loop must converge like the XLA controller,
        artifacts must satisfy their contracts, and the solve must be
        seed-deterministic."""
        kw = dict(num_samples=512, horizon=10, lambda_=1.0, seed=3,
                  u_max=jnp.array([1.0, 1.0], DT))
        c_pal = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True, **kw)
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(12):
            a = c_pal.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.0
        assert c_pal.noise is None and c_pal.perturbed_action is None
        np.testing.assert_allclose(float(jnp.sum(c_pal.omega)), 1.0, rtol=1e-4)
        assert np.isfinite(np.asarray(c_pal.cost_total)).all()
        # same seed -> identical trajectory of commands
        c2 = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True, **kw)
        c3 = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True, **kw)
        s0 = jnp.array([-3.0, -2.0], DT)
        np.testing.assert_array_equal(
            np.asarray(c2.command(s0)), np.asarray(c3.command(s0))
        )

    def test_fused_artifacts_surface(self):
        """use_pallas + fused_artifacts=True: the kernel additionally stores
        the clamped perturbed actions and the controller reconstructs the
        noise artifact.  Contracts checked on the chip: perturbed within
        bounds; perturbed - noise collapses to ONE shared nominal sequence;
        re-rolling the emitted trajectories through the XLA engine reproduces
        the kernel's own cost_total (proof the tensor is what the kernel
        actually rolled out, not merely plausible noise); and emitting must
        not change the solve itself."""
        K_, T_ = 512, 8
        kw = dict(num_samples=K_, horizon=T_, lambda_=1.0, seed=3,
                  u_max=jnp.array([1.0, 1.0], DT))
        c = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                 fused_artifacts=True, **kw)
        state = jnp.array([-3.0, -2.0], DT)
        a = c.command(state)
        assert c.noise is not None and c.perturbed_action is not None
        assert c.perturbed_action.shape == (K_, T_, 2)
        assert c.noise.shape == (K_, T_, 2)
        pa = np.asarray(c.perturbed_action)
        assert (np.abs(pa) <= 1.0 + 1e-6).all()
        # perturbed - noise is the nominal the solve perturbed — shared
        # across all K samples (fl(p - fl(p - U)) != U exactly, so this is
        # allclose, not bit-equal)
        U_sol = np.asarray(c.perturbed_action - c.noise)
        np.testing.assert_allclose(
            U_sol, np.broadcast_to(U_sol[:1], U_sol.shape),
            rtol=1e-5, atol=1e-6)
        # re-roll the emitted trajectories through the XLA path: running cost
        # + action cost must reproduce the kernel's cost_total
        rc, _, _ = S.rollout_costs(c.config, S.wrap_dynamics(c.config, dyn),
                                   S.wrap_cost(c.config, cost), None, None,
                                   None, state, c.perturbed_action,
                                   jax.random.PRNGKey(0))
        # lambda=1, sigma=I: action cost is <noise, U> per sample
        pc = jnp.einsum("ktu,tu->k", jnp.asarray(c.noise),
                        jnp.asarray(U_sol[0]))
        np.testing.assert_allclose(np.asarray(rc + pc),
                                   np.asarray(c.cost_total),
                                   rtol=2e-4, atol=2e-3)
        # the extra HBM store must not perturb the solve: same seed without
        # artifacts gives the same command
        c2 = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c2.command(state)),
                                   rtol=1e-5, atol=1e-6)
        assert c2.noise is None

    def test_fused_artifacts_smppi_kmppi(self):
        """The variant kernels' emit_perturbed Mosaic lowering: SMPPI emits
        post-both-clamps ACTION-space sequences (within action bounds, with
        the rate-space noise back-computed); KMPPI emits post-trajectory-clamp
        full-horizon actions."""
        from pytorch_mppi_tpu import KMPPI, RBFKernel, SMPPI

        kw = dict(num_samples=256, horizon=8, lambda_=1.0, seed=3,
                  u_max=jnp.array([0.5, 0.5], DT))
        sm = SMPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                   fused_artifacts=True, delta_t=0.8,
                   action_max=jnp.array([1.0, 1.0], DT), **kw)
        state = jnp.array([-3.0, -2.0], DT)
        sm.command(state)
        assert sm.perturbed_action is not None and sm.noise is not None
        assert (np.abs(np.asarray(sm.perturbed_action)) <= 1.0 + 1e-6).all()
        # rate-space noise back-computation: perturbed = action_sequence +
        # delta_t*(U + noise) before clamps; after clamps the identity holds
        # exactly by reconstruction
        rec = (np.asarray(sm.perturbed_action)
               - 0.8 * np.asarray(sm.noise)).reshape(256, -1)
        # the /delta_t then *delta_t round-trip is not exact in f32, so the
        # shared (action_sequence + delta_t*U) only agrees to rounding
        np.testing.assert_allclose(rec, np.broadcast_to(rec[:1], rec.shape),
                                   rtol=1e-5, atol=1e-5)

        km = KMPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                   fused_artifacts=True, num_support_pts=4,
                   kernel=RBFKernel(sigma=2.0), **kw)
        km.command(state)
        assert km.perturbed_action is not None and km.noise is not None
        assert km.perturbed_action.shape == (256, 8, 2)
        assert (np.abs(np.asarray(km.perturbed_action)) <= 0.5 + 1e-6).all()
        U_sol = np.asarray(km.perturbed_action - km.noise)
        np.testing.assert_allclose(
            U_sol, np.broadcast_to(U_sol[:1], U_sol.shape),
            rtol=1e-5, atol=1e-6)

    def test_transposed_smppi_closed_loop(self):
        """SMPPI with use_pallas=True (transposed rate-space kernel, in-kernel
        PRNG): closed loop converges, artifacts contracts hold, and the
        smoothness weight demonstrably changes the solve."""
        from pytorch_mppi_tpu import SMPPI

        kw = dict(num_samples=512, horizon=10, lambda_=1.0, seed=3,
                  u_max=jnp.array([0.5, 0.5], DT),
                  action_max=jnp.array([1.0, 1.0], DT), delta_t=0.8)
        ctrl = SMPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                     w_action_seq_cost=2.0, **kw)
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(15):
            a = ctrl.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.2
        assert ctrl.noise is None
        np.testing.assert_allclose(float(jnp.sum(ctrl.omega)), 1.0, rtol=1e-4)
        # action bounds respected by construction (in-kernel clamp)
        assert float(jnp.abs(a).max()) <= 1.0 + 1e-5

    def test_transposed_kmppi_closed_loop(self):
        """KMPPI with use_pallas=True (support-point noise + in-kernel
        interpolation + theta-space update): closed loop converges; theta
        stays bounded by the control-point clamp."""
        from pytorch_mppi_tpu import KMPPI, RBFKernel

        kw = dict(num_samples=512, horizon=10, lambda_=1.0, seed=3,
                  u_max=jnp.array([1.0, 1.0], DT))
        ctrl = KMPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                     num_support_pts=5, kernel=RBFKernel(sigma=2.0), **kw)
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(15):
            a = ctrl.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.2
        assert ctrl.noise is None
        assert np.isfinite(np.asarray(ctrl.theta)).all()

    def test_transposed_batched_closed_loop(self):
        """MPPI_Batched with use_pallas=True: the (N, K-blocks)-grid kernel
        regenerates shared noise per plant in VMEM; plants converge
        independently and per-plant weights are normalized."""
        from pytorch_mppi_tpu import MPPI_Batched

        N = 4
        # K=512 sits below the measured crossover, where use_pallas=True
        # auto-routes to XLA; "force" keeps the kernel under test
        ctrl = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=N,
                            num_samples=512, horizon=10, seed=3,
                            u_max=jnp.array([1.0, 1.0], DT),
                            use_pallas="force")
        states = jnp.asarray([[-3.0, -2.0], [-1.0, 1.0], [4.0, 4.0],
                              [0.0, -3.0]], DT)
        d0 = jnp.linalg.norm(states - GOAL, axis=-1)
        for _ in range(12):
            actions = ctrl.command(states)
            states = dyn(states, actions)
        d1 = jnp.linalg.norm(states - GOAL, axis=-1)
        assert (np.asarray(d1) < np.asarray(d0) + 0.3).all()
        assert float(jnp.max(d1)) < 1.5
        np.testing.assert_allclose(np.asarray(ctrl.omega.sum(axis=1)),
                                   np.ones(N), rtol=1e-4)
        # shared noise: identical plants (same state AND same nominal
        # sequence — the random U init differs per plant) produce identical
        # actions, because every plant's K-blocks reseed with the same
        # block-indexed hardware seeds
        ctrl2 = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=2,
                             num_samples=512, horizon=10, seed=3,
                             u_max=jnp.array([1.0, 1.0], DT),
                             use_pallas="force")
        ctrl2.U = jnp.broadcast_to(ctrl2.U[0], ctrl2.U.shape)
        same = jnp.asarray([[1.0, -1.0], [1.0, -1.0]], DT)
        a = np.asarray(ctrl2.command(same))
        np.testing.assert_array_equal(a[0], a[1])

    def test_batched_noise_operand_compiled(self):
        """The noise-operand batched kernel compiled under Mosaic: fed the
        SAME underlying draw as the bits-injection kernel, every post-draw
        step is shared, so the outputs must agree to last-ulp f32; and the
        controller-plumbing override converges in closed loop with the XLA
        rbg draw feeding the kernel."""
        from pytorch_mppi_tpu.ops.solve import (BatchedState,
                                                make_batched_step)

        N, K, T, NU = 3, 256, 6, 2
        D = T * NU
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        solve_bits = jax.jit(PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, rng_in_kernel=False))
        solve_op_kernel = PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, noise_operand=True)
        solve_op = jax.jit(solve_op_kernel)

        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U = jax.random.normal(jax.random.PRNGKey(5), (N, T, NU), DT) * 0.1
        x0 = jnp.asarray([[-3.0, -2.0], [1.0, 1.0], [0.5, -0.5]], DT)
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        a2 = (lam * U.reshape(N, D) / 0.64)
        args = (x0.T, U.reshape(N, D).T, scale_t, mu_t, -ones, ones, a2.T,
                lam)

        delta_b, ms_b, ct_b = solve_bits(bits, *args)
        noiseT = PR._bits_to_normal(bits, use_pltpu=False) * scale_t[:, None]
        delta_o, ms_o, ct_o = solve_op(noiseT, *args)
        # the bits->normal map runs under Mosaic on one side and XLA on the
        # other; the established on-chip band for that split is ~2e-4
        # (test_transposed_solve_pregen_bits_compiled)
        np.testing.assert_allclose(np.asarray(ct_o), np.asarray(ct_b),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(delta_o), np.asarray(delta_b),
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ms_o), np.asarray(ms_b),
                                   rtol=2e-4, atol=0)

        # end-to-end through the step plumbing: XLA rbg draw -> kernel
        from pytorch_mppi_tpu.config import MPPIParams

        params = MPPIParams(
            noise_mu=mu_t[:NU], noise_sigma=jnp.eye(NU, dtype=DT) * 0.64,
            lambda_=lam, u_min=-ones[:NU], u_max=ones[:NU],
            u_init=jnp.zeros(NU, DT))
        fns = make_batched_step(config, N, dyn, cost,
                                transposed_solve_override=solve_op_kernel)
        key = jax.random.key(3, impl="rbg")
        state = BatchedState(
            U=S.sample_noise(key, (N, T), params, DT), key=key)
        x = x0
        d0 = jnp.linalg.norm(x - GOAL, axis=-1)
        for _ in range(12):
            state, a, art = fns.step(params, state, x)
            x = dyn(x, a)
        d1 = jnp.linalg.norm(x - GOAL, axis=-1)
        assert (np.asarray(d1) < np.asarray(d0)).all()
        assert float(jnp.max(d1)) < 1.5
        np.testing.assert_allclose(np.asarray(art.omega.sum(axis=1)),
                                   np.ones(N), rtol=1e-4)

    def test_sharded_fused_solve_one_device_mesh(self):
        """use_pallas + mesh: the K-sharded fused path (per-shard kernels +
        pmax/psum flash-stat collectives) compiled on a 1-device 'k' mesh —
        validates the shard_map+Pallas composition on real hardware (the
        multi-shard math is pinned on the CPU virtual mesh,
        tests/test_pallas_transposed.py)."""
        from pytorch_mppi_tpu.parallel import make_mesh

        mesh = make_mesh((1,), ("k",))
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=512,
                    horizon=10, lambda_=1.0, seed=3, mesh=mesh,
                    sample_axis="k", use_pallas=True,
                    u_max=jnp.array([1.0, 1.0], DT))
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(12):
            a = ctrl.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.0
        # the fused path ran: noise artifact not materialized
        assert ctrl.noise is None

    def test_sharded_fused_null_and_artifacts_one_device_mesh(self):
        """sample_null_action + fused_artifacts on the K-sharded fused path,
        compiled on the 1-device 'k' mesh: the dynamic null gate (an SMEM
        operand fed by axis_index == 0) must lower under Mosaic, sample 0
        must be the zero action, and the artifact surface must come back."""
        from pytorch_mppi_tpu.parallel import make_mesh

        mesh = make_mesh((1,), ("k",))
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=512,
                    horizon=8, lambda_=1.0, seed=3, mesh=mesh,
                    sample_axis="k", use_pallas=True, fused_artifacts=True,
                    sample_null_action=True,
                    u_max=jnp.array([1.0, 1.0], DT))
        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(10):
            a = ctrl.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.2
        assert ctrl.perturbed_action is not None and ctrl.noise is not None
        pa = np.asarray(ctrl.perturbed_action)
        assert pa.shape == (512, 8, 2)
        # sample 0 is the null action, exactly
        np.testing.assert_array_equal(pa[0], np.zeros((8, 2), np.float32))
        # and the only one
        zero_rows = (np.abs(pa.reshape(512, -1)) < 1e-12).all(axis=1)
        assert zero_rows.sum() == 1 and zero_rows[0]
        assert (np.abs(pa) <= 1.0 + 1e-6).all()

    def test_sharded_batched_fused_one_device_mesh(self):
        """MPPI_Batched with an env mesh + use_pallas: per-shard batched
        kernels under shard_map, compiled on the 1-device 'data' mesh."""
        from pytorch_mppi_tpu import MPPI_Batched
        from pytorch_mppi_tpu.parallel import make_mesh

        mesh = make_mesh((1,), ("data",))
        ctrl = MPPI_Batched(dyn, cost, 2, jnp.eye(2, dtype=DT), num_envs=4,
                            num_samples=2048, horizon=8, seed=3, mesh=mesh,
                            env_axis="data", use_pallas=True,
                            u_max=jnp.array([1.0, 1.0], DT))
        states = jnp.asarray([[-3.0, -2.0], [-1.0, 1.0], [3.0, 3.0],
                              [0.0, -2.0]], DT)
        d0 = jnp.linalg.norm(states - GOAL, axis=-1)
        for _ in range(10):
            actions = ctrl.command(states)
            states = dyn(states, actions)
        d1 = jnp.linalg.norm(states - GOAL, axis=-1)
        assert float(jnp.max(d1)) < float(jnp.max(d0))
        assert np.isfinite(np.asarray(ctrl.cost_total)).all()

    def test_population_evaluator_with_fused_controller(self):
        """Tuning a use_pallas controller: the population evaluator must vmap
        the XLA bundle (the fused kernel's SMEM seed has no batching rule —
        this exact call crashed in Mosaic lowering before the guard), while
        the controller's own command() keeps the kernel."""
        from pytorch_mppi_tpu import autotune

        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=2048,
                    horizon=8, lambda_=1.0, seed=1,
                    u_max=jnp.array([2.0, 2.0], DT), use_pallas=True)
        ev = autotune.PopulationEvaluator(
            ctrl, jnp.array([-3.0, -2.0], DT), num_refinement_steps=2,
            num_trajectories=1,
        )
        res = ev([
            {"sigma": jnp.array([1.0, 1.0])},
            {"sigma": jnp.array([4.0, 4.0])},
            {"lambda": 0.5},
        ])
        c = np.asarray(res.costs)
        assert c.shape == (3,) and np.isfinite(c).all()
        # the controller's own solve still runs the fused path
        ctrl.command(jnp.array([-3.0, -2.0], DT))
        assert ctrl.noise is None
        assert ctrl.use_pallas is True

    def test_transposed_solve_compiled_pregen_bits(self):
        """The generalized transposed fused solve, compiled on the chip with
        pre-generated bits, against the identical plain-jnp math — Mosaic
        lowering parity for the batch-last evaluation path."""
        from pytorch_mppi_tpu.ops.batch_last import eval_jaxpr_batch_last  # noqa: F401

        K, T, NU = 256, 6, 2
        D = T * NU
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        solve = jax.jit(PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False))
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(0.9, DT)
        a_flat = U2 * lam
        x0 = jnp.array([-1.0, 0.5], DT)
        x0T = jnp.broadcast_to(x0[:, None], (2, K))
        delta, m, s, ct = solve(bits, x0T, U2, ones, 0 * ones, -ones, ones,
                                a_flat, lam)

        z = PR._bits_to_normal(bits, use_pltpu=False)
        noise2 = z.T
        pert2 = jnp.clip(U2[None] + noise2, -ones, ones)
        noise2 = pert2 - U2[None]
        pc = noise2 @ a_flat
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert2.reshape(K, T, NU),
                                   jax.random.PRNGKey(0))
        ct_ref = rc + pc
        _, om = S.compute_weighting(ct_ref, lam)
        np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_ref),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(delta / s),
                                   np.asarray(om @ noise2), rtol=2e-3,
                                   atol=1e-4)

    def test_transposed_solve_mlp_dynamics_compiled(self):
        """Generalization evidence on the chip: an MLP dynamics (matmuls +
        tanh + broadcast bias) through the batch-last transform, compiled,
        against the scan path."""
        K, T, NU = 256, 5, 2
        D = T * NU
        rs = np.random.RandomState(0)
        W1 = jnp.asarray(rs.randn(4, 32) * 0.3, DT)
        b1 = jnp.asarray(rs.randn(32) * 0.1, DT)
        W2 = jnp.asarray(rs.randn(32, 2) * 0.3, DT)
        mlp = lambda s, a: s + jnp.tanh(jnp.concatenate([s, a], -1) @ W1 + b1) @ W2
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        wdyn = S.wrap_dynamics(config, mlp)
        wcost = S.wrap_cost(config, cost)
        solve = jax.jit(PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False))
        bits = jax.random.randint(
            jax.random.PRNGKey(7), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jnp.zeros((D,), DT)
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        x0 = jnp.array([-1.0, 0.5], DT)
        x0T = jnp.broadcast_to(x0[:, None], (2, K))
        delta, m, s, ct = solve(bits, x0T, U2, ones, 0 * ones, -2 * ones,
                                2 * ones, 0 * ones, lam)
        z = PR._bits_to_normal(bits, use_pltpu=False)
        pert2 = jnp.clip(z.T, -2.0, 2.0)
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert2.reshape(K, T, NU),
                                   jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(ct), np.asarray(rc), rtol=1e-3,
                                   atol=5e-3)

    def test_fused_sampler_compiled(self):
        """The fused sampling front-end (measured-and-rejected, kept with the
        decision record): compiled hardware-PRNG path produces valid draws and
        the pregen-bits path matches plain jnp exactly."""
        K, T, NU = 1024, 6, 2
        D = T * NU
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        sampler = jax.jit(PR.make_fused_sampler(config, rng_in_kernel=False))
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (K, D), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(4), (D,), DT) * 0.2
        ones = jnp.ones((D,), DT)
        pert, pc = sampler(bits, U2, ones, 0 * ones, -ones, ones, U2)
        z = PR._bits_to_normal(bits, use_pltpu=False)
        pert_ref = jnp.clip(U2[None] + z, -1.0, 1.0)
        pc_ref = (pert_ref - U2[None]) @ U2
        np.testing.assert_allclose(np.asarray(pert), np.asarray(pert_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pc), np.asarray(pc_ref),
                                   rtol=1e-4, atol=1e-4)
        # hardware-PRNG path: correct moments
        hw = jax.jit(PR.make_fused_sampler(config, rng_in_kernel=True))
        seed = PR.key_to_seed(jax.random.PRNGKey(11))
        pert_hw, _ = hw(seed, 0 * U2, ones, 0 * ones, -10 * ones, 10 * ones,
                        0 * U2)
        zs = np.asarray(pert_hw)
        assert abs(zs.mean()) < 0.02 and abs(zs.std() - 1.0) < 0.02

    def test_fused_solve_compiled_pregen_bits(self):
        """The fully-fused single-kernel solve, compiled, with pre-generated
        bits — identical math to the plain-jnp pipeline from the
        uniform->normal conversion onward."""
        K, T, NU = 256, 6, 2
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        solve = jax.jit(PR.make_fused_solve(config, wdyn, wcost, rng_in_kernel=False))
        D = T * NU
        _, K_pad = PR.fused_solve_block_and_pad(K)
        bits = jax.random.bits(jax.random.PRNGKey(0), (K_pad, D),
                               jnp.uint32).astype(jnp.int32)
        U = jax.random.normal(jax.random.PRNGKey(1), (T, NU), DT) * 0.1
        chol = jnp.eye(NU, dtype=DT)
        mu = jnp.zeros(NU, DT)
        lo = jnp.full((NU,), -1.0, DT)
        hi = jnp.full((NU,), 1.0, DT)
        lam = jnp.asarray(0.7, DT)
        a_flat = (lam * U).reshape(-1)
        x0 = jnp.array([-1.0, 0.5], DT)
        delta, m, s, ct = solve(bits, x0, U, chol, mu, lo, hi, a_flat, lam)

        # the reference computation runs in plain XLA: use the lax bitcast
        z = PR._bits_to_normal(bits, use_pltpu=False)[:K].reshape(K, T, NU)
        pert = jnp.clip(U[None] + z, lo, hi)
        noise_r = pert - U[None]
        pc = jnp.sum(U[None] * (lam * noise_r), axis=(1, 2))
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert, jax.random.PRNGKey(2))
        ct_ref = rc + pc
        _, om = S.compute_weighting(ct_ref, lam)
        delta_ref = jnp.einsum("k,ktn->tn", om, noise_r)
        np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_ref),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(delta / s),
                                   np.asarray(delta_ref), rtol=2e-3, atol=1e-4)

    def test_fused_solve_hardware_prng(self):
        """In-kernel hardware PRNG (prng_seed + prng_random_bits): compiled-
        only path with no CPU equivalent.  The draws must be valid standard
        normals and the solve must land near the scan-path solve in
        distribution (same U, different RNG stream)."""
        K, T, NU = 512, 6, 2
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        solve = jax.jit(PR.make_fused_solve(config, wdyn, wcost, rng_in_kernel=True))
        U = jnp.zeros((T, NU), DT)
        chol = jnp.eye(NU, dtype=DT)
        mu = jnp.zeros(NU, DT)
        lo = jnp.full((NU,), -jnp.inf, DT)
        hi = jnp.full((NU,), jnp.inf, DT)
        lam = jnp.asarray(1.0, DT)
        a_flat = jnp.zeros(T * NU, DT)
        x0 = jnp.array([-1.0, 0.5], DT)
        seed = PR.key_to_seed(jax.random.PRNGKey(9))
        delta, m, s, ct = solve(seed, x0, U, chol, mu, lo, hi, a_flat, lam)
        assert np.isfinite(np.asarray(ct)).all()
        assert float(s) > 0
        # distinct seeds -> distinct cost vectors
        seed2 = PR.key_to_seed(jax.random.PRNGKey(10))
        _, _, _, ct2 = solve(seed2, x0, U, chol, mu, lo, hi, a_flat, lam)
        assert not np.allclose(np.asarray(ct), np.asarray(ct2))

    def test_in_kernel_normals_distribution(self):
        """The hardware-PRNG normal draws have correct moments, measured
        through the solve's cost vector on a pure-noise problem: with U=0 and
        dynamics x' = x + u, after 1 step cost = ||GOAL - x0 - z||^2, whose
        mean over K is ||GOAL - x0||^2 + nu for z ~ N(0, I)."""
        K, T, NU = 4096, 1, 2
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        solve = jax.jit(PR.make_fused_solve(config, wdyn, wcost, rng_in_kernel=True))
        U = jnp.zeros((T, NU), DT)
        x0 = jnp.array([0.0, 0.0], DT)
        delta, m, s, ct = solve(
            PR.key_to_seed(jax.random.PRNGKey(4)), x0, U,
            jnp.eye(NU, dtype=DT), jnp.zeros(NU, DT),
            jnp.full((NU,), -jnp.inf, DT), jnp.full((NU,), jnp.inf, DT),
            jnp.zeros(T * NU, DT), jnp.asarray(1.0, DT),
        )
        # E[cost] = ||GOAL||^2 + 2 (B flips the sign of z2's effect; the
        # distribution of the summed square is unchanged)
        expected = float((GOAL**2).sum()) + 2.0
        got = float(np.mean(np.asarray(ct)))
        assert abs(got - expected) < 0.35, (got, expected)

    def test_flash_weighting_matches_xla(self):
        """fused_weighted_update (streaming flash-softmax reduction) against
        compute_weighting + matmul, compiled on the chip."""
        K, D = 1024, 60
        key = jax.random.PRNGKey(11)
        ct = jax.random.uniform(key, (K,), DT, 0.0, 50.0)
        noise = jax.random.normal(jax.random.split(key)[0], (K, D), DT)
        lam = jnp.asarray(1.3, DT)
        pert, m, s = jax.jit(PR.fused_weighted_update)(ct, noise, lam)
        _, om = S.compute_weighting(ct, lam)
        ref = om @ noise
        np.testing.assert_allclose(np.asarray(pert / s), np.asarray(ref),
                                   rtol=2e-3, atol=1e-3)
        cz, om2 = PR.weighting_from_stats(ct, lam, m, s)
        np.testing.assert_allclose(np.asarray(om2), np.asarray(om),
                                   rtol=1e-4, atol=1e-7)

    def test_fused_rollout_compiled(self):
        """The rollout+cost kernel alone (make_fused_rollout), compiled."""
        K, T, NU = 256, 8, 2
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        fr = jax.jit(PR.make_fused_rollout(config, wdyn, wcost))
        x0 = jnp.broadcast_to(jnp.array([-1.0, 0.5], DT), (K, 2))
        acts = jax.random.normal(jax.random.PRNGKey(2), (K, T, NU), DT)
        got = fr(x0, acts)
        want, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None,
                                     jnp.array([-1.0, 0.5], DT), acts,
                                     jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-3)


class TestTerminalFinalOnChip:
    """Final-state terminal cost inside the transposed kernel, compiled on
    the chip (Mosaic lowering of the terminal jaxpr's batch-last
    evaluation), plus the controller-level routing: ``use_pallas=True`` with
    ``terminal_final_cost`` must stay on the fused kernel (the full
    ``terminal_state_cost`` hook falls back to the XLA scan path)."""

    W = jnp.array([3.0, 1.0], DT)

    @classmethod
    def _fterm(cls, s, a):
        return (cls.W * (s - GOAL) ** 2).sum(axis=-1) + 0.2 * (a ** 2).sum(axis=-1)

    def test_compiled_pregen_bits_parity(self):
        K, T, NU = 256, 6, 2
        D = T * NU
        config = MPPIConfig(nx=2, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        wterm = S.wrap_final_cost(self._fterm)
        solve = jax.jit(PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False, terminal_final=wterm))
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(0.9, DT)
        a_flat = U2 * lam
        x0 = jnp.array([-1.0, 0.5], DT)
        x0T = jnp.broadcast_to(x0[:, None], (2, K))
        delta, m, s, ct = solve(bits, x0T, U2, ones, 0 * ones, -ones, ones,
                                a_flat, lam)

        z = PR._bits_to_normal(bits, use_pltpu=False)
        noise2 = z.T
        pert2 = jnp.clip(U2[None] + noise2, -ones, ones)
        noise2 = pert2 - U2[None]
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert2.reshape(K, T, NU),
                                   jax.random.PRNGKey(0),
                                   terminal_final_cost=wterm)
        ct_ref = rc + noise2 @ a_flat
        np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_ref),
                                   rtol=2e-4, atol=2e-3)

    def test_routing_and_closed_loop(self, caplog):
        """terminal_final_cost keeps the fused route (info log names the
        transposed kernel; no fallback warning) and the closed loop
        converges; terminal_state_cost on the same config falls back."""
        import logging

        kw = dict(num_samples=512, horizon=10, lambda_=1.0, seed=3,
                  u_max=jnp.array([1.0, 1.0], DT))
        with caplog.at_level(logging.INFO):
            c_fin = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                         terminal_final_cost=self._fterm, **kw)
        assert any("transposed" in r.message for r in caplog.records
                   if r.levelno == logging.INFO), caplog.records
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), use_pallas=True,
                 terminal_state_cost=lambda st, ac: self._fterm(
                     st[..., -1, :], ac[..., -1, :]), **kw)
        assert any("ineligible" in r.message for r in caplog.records)

        state = jnp.array([-3.0, -2.0], DT)
        for _ in range(12):
            a = c_fin.command(state)
            state = dyn(state[None], a[None])[0]
        assert float(jnp.linalg.norm(GOAL - state)) < 1.0
        assert c_fin.states is None  # lazy storage kept on the fused route
