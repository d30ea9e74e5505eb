"""Transposed (K-on-lanes) fused solve vs the identical math in plain jnp.

CPU interpret-mode parity: bits are injected as an input (``prng_seed`` has no
CPU lowering), so every step from the uniform->normal map through the
flash-softmax weighted update can be pinned bitwise-close against a plain-jnp
mirror of the same pipeline — across dynamics families, thanks to the
batch-axis-last jaxpr evaluation (ops/batch_last.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu.config import MPPIConfig
from pytorch_mppi_tpu.ops import pallas_rollout as PR
from pytorch_mppi_tpu.ops import solve as S
from pytorch_mppi_tpu.ops.batch_last import UnsupportedPrimitive

DT = jnp.float32
K, T, NU, NX = 256, 6, 2, 2  # K a lane-block multiple: bits shape == kernel block
D = T * NU

B = jnp.array([[1.0, 0.0], [0.0, -1.0]], DT)
GOAL = jnp.array([2.0, 2.0], DT)


def lin_dyn(s, a):
    return s + a @ B.T


def quad_cost(s, a):
    return ((GOAL - s) ** 2).sum(axis=-1)


W1 = jnp.asarray(np.random.RandomState(0).randn(4, 16) * 0.3, DT)
W2 = jnp.asarray(np.random.RandomState(1).randn(16, 2) * 0.3, DT)


def mlp_dyn(s, a):
    h = jnp.tanh(jnp.concatenate([s, a], axis=-1) @ W1)
    return s + h @ W2


def _mirror(config, dyn, cost, bits, x0, U2, scale_t, mu_t, lo_t, hi_t,
            a_flat, lam):
    """The identical math in plain jnp, batch-first (shapes from config)."""
    z = PR._bits_to_normal(bits)  # (D, Keff)
    if config.antithetic:
        z = jnp.concatenate([z, -z], axis=1)
    noise2 = z.T * scale_t[None, :] + mu_t[None, :]
    perturbed2 = U2[None] + noise2
    if config.sample_null_action:
        perturbed2 = perturbed2.at[0].set(0.0)
    perturbed2 = jnp.clip(perturbed2, lo_t, hi_t)
    noise2 = perturbed2 - U2[None]
    n_for_cost = jnp.abs(noise2) if config.noise_abs_cost else noise2
    pert_cost = n_for_cost @ a_flat
    wdyn = S.wrap_dynamics(config, dyn)
    wcost = S.wrap_cost(config, cost)
    rc, _, _ = S.rollout_costs(
        config, wdyn, wcost, None, None, None, x0,
        perturbed2.reshape(config.K, config.T, config.nu) * 1.0,
        jax.random.PRNGKey(0),
    )
    ct = rc + pert_cost
    logits = -ct / lam
    m = jnp.max(logits)
    w = jnp.exp(logits - m)
    s_ = jnp.sum(w)
    delta = (w / s_) @ noise2
    return ct, m, s_, delta, perturbed2


def _run_pair(dyn, cost, **cfg_kw):
    config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                        **cfg_kw)
    bh = K // 2 if config.antithetic else K
    bits = jax.random.randint(
        jax.random.PRNGKey(3), (D, bh), -(2**31), 2**31 - 1, jnp.int32
    )
    U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
    scale_t = jnp.full((D,), 0.8, DT)
    mu_t = jnp.full((D,), 0.05, DT)
    lo_t = jnp.full((D,), -1.0, DT)
    hi_t = jnp.full((D,), 1.0, DT)
    a_flat = U2 * 0.7
    lam = jnp.asarray(1.0, DT)
    x0 = jnp.array([-3.0, -2.0], DT)

    # NOTE: u_scale handled inside both paths via config
    solve = PR.make_transposed_fused_solve(config, S.wrap_dynamics(config, dyn),
                                           S.wrap_cost(config, cost),
                                           rng_in_kernel=False)
    x0T = jnp.broadcast_to(x0[:, None], (NX, K))
    delta_k, m_k, s_k, ct_k = jax.jit(solve)(
        bits, x0T, U2, scale_t, mu_t, lo_t, hi_t, a_flat, lam
    )
    ct_m, m_m, s_m, delta_m, pert_m = _mirror(
        config, dyn, cost, bits, x0, U2, scale_t, mu_t, lo_t, hi_t, a_flat,
        lam,
    )
    np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(m_k), float(m_m), rtol=1e-6)
    np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(delta_k) / float(s_k),
                               np.asarray(delta_m), rtol=2e-4, atol=2e-6)

    # artifact-emitting build (emit_perturbed): identical solve outputs
    # (bit-exact — same kernel math, one extra store) plus the clamped
    # perturbed actions, which match the mirror to elementwise f32 rounding
    # (the kernel's scale/add association differs by <=1 ulp); the
    # rectified-noise artifact is perturbed - U by definition
    solve_a = PR.make_transposed_fused_solve(
        config, S.wrap_dynamics(config, dyn), S.wrap_cost(config, cost),
        rng_in_kernel=False, emit_perturbed=True,
    )
    delta_a, m_a, s_a, ct_a, pert_k = jax.jit(solve_a)(
        bits, x0T, U2, scale_t, mu_t, lo_t, hi_t, a_flat, lam
    )
    np.testing.assert_array_equal(np.asarray(ct_a), np.asarray(ct_k))
    np.testing.assert_array_equal(np.asarray(delta_a), np.asarray(delta_k))
    np.testing.assert_allclose(np.asarray(pert_k.T), np.asarray(pert_m),
                               rtol=1e-5, atol=1e-7)


class TestTransposedSolve:
    def test_linear(self):
        _run_pair(lin_dyn, quad_cost)

    def test_linear_null_action_abs_cost(self):
        _run_pair(lin_dyn, quad_cost, sample_null_action=True,
                  noise_abs_cost=True)

    def test_linear_antithetic(self):
        _run_pair(lin_dyn, quad_cost, antithetic=True)

    def test_mlp(self):
        _run_pair(mlp_dyn, quad_cost)

    def test_u_scale(self):
        _run_pair(lin_dyn, quad_cost, u_scale=2.5)

    def test_step_dependent(self):
        def sd_dyn(s, a, t):
            return s + a @ B.T * (1.0 + 0.01 * t)

        def sd_cost(s, a, t):
            return quad_cost(s, a) * (1.0 + 0.005 * t)

        _run_pair(sd_dyn, sd_cost, step_dependent_dynamics=True)

    def test_odd_shapes_padded(self):
        """nu=3 (odd sublane blocks, D=21) with K=200 (non-128-multiple,
        phantom-lane padding) — the shape corners the flagship config never
        exercises."""
        nu, t_, k_ = 3, 7, 200
        d_ = t_ * nu
        B3 = jnp.asarray(np.random.RandomState(2).randn(2, nu) * 0.5, DT)
        dyn3 = lambda s, a: s + a @ B3.T
        config = MPPIConfig(nx=NX, nu=nu, K=k_, T=t_, dtype=DT,
                            diag_sigma=True, u_scale=1.3)
        from pytorch_mppi_tpu.ops.pallas_rollout import _transposed_block

        _, k_pad = _transposed_block(k_, d_)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (d_, k_pad), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_fused_solve(
            config, S.wrap_dynamics(config, dyn3),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (d_,), DT) * 0.1
        ones = jnp.ones((d_,), DT)
        lam = jnp.asarray(0.8, DT)
        a_flat = U2 * 0.7
        x0 = jnp.array([-2.0, 1.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, k_))
        delta_k, m_k, s_k, ct_k = jax.jit(solve)(
            bits, x0T, U2, 0.9 * ones, 0 * ones, -ones, ones, a_flat, lam)

        z = PR._bits_to_normal(bits)[:, :k_]
        noise2 = z.T * 0.9
        pert2 = jnp.clip(U2[None] + noise2, -1.0, 1.0)
        noise2 = pert2 - U2[None]
        pc = noise2 @ a_flat
        wdyn = S.wrap_dynamics(config, dyn3)
        wcost = S.wrap_cost(config, quad_cost)
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert2.reshape(k_, t_, nu),
                                   jax.random.PRNGKey(0))
        ct_m = rc + pc
        logits = -ct_m / lam
        m_m = jnp.max(logits)
        w = jnp.exp(logits - m_m)
        s_m = jnp.sum(w)
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(delta_k) / float(s_k),
            np.asarray((w / s_m) @ noise2), rtol=2e-4, atol=2e-6)

    def test_unsupported_dynamics_raises(self):
        def bad_dyn(s, a):
            return s - s.mean(axis=0, keepdims=True) + a

        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        with pytest.raises(UnsupportedPrimitive):
            PR.make_transposed_fused_solve(
                config, S.wrap_dynamics(config, bad_dyn),
                S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            )

    @pytest.mark.parametrize("null_action", [False, True], ids=["plain", "null"])
    def test_smppi_variant(self, null_action):
        """SMPPI transposed kernel vs the identical rate-space math in plain
        jnp: rate clamp, integration, action clamp, back-computed noise,
        smoothness cost, theta... all bitwise-close."""
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            u_scale=1.5, sample_null_action=null_action)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_smppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        as2 = jax.random.normal(jax.random.PRNGKey(6), (D,), DT) * 0.2
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -2.0, DT)   # rate bounds
        hi_t = jnp.full((D,), 2.0, DT)
        alo_t = jnp.full((D,), -1.0, DT)  # action bounds
        ahi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam, w_seq, dt_ = jnp.asarray(1.0, DT), jnp.asarray(5.0, DT), \
            jnp.asarray(0.5, DT)
        x0 = jnp.array([-1.0, -1.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        delta_k, m_k, s_k, ct_k = jax.jit(solve)(
            bits, x0T, U2, as2, scale_t, mu_t, lo_t, hi_t, alo_t, ahi_t,
            a_flat, lam, w_seq, dt_,
        )

        z = PR._bits_to_normal(bits)
        noise2 = z.T * scale_t[None]
        pert_rate = jnp.clip(U2[None] + noise2, lo_t, hi_t)
        pert_act = as2[None] + pert_rate * dt_
        if null_action:
            pert_act = pert_act.at[0].set(0.0)
        pert_act = jnp.clip(pert_act, alo_t, ahi_t)
        noise2 = (pert_act - as2[None]) / dt_ - U2[None]
        pc = noise2 @ a_flat
        adiff = 1.5 * (pert_act[:, NU:] - pert_act[:, :-NU])
        smooth = w_seq * jnp.sum(adiff**2, axis=1)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert_act.reshape(K, T, NU),
                                   jax.random.PRNGKey(0))
        ct_m = rc + pc + smooth
        logits = -ct_m / lam
        m_m = jnp.max(logits)
        w = jnp.exp(logits - m_m)
        s_m = jnp.sum(w)
        delta_m = (w / s_m) @ noise2
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(delta_k) / float(s_k),
                                   np.asarray(delta_m), rtol=2e-4, atol=2e-6)

        # artifact-emitting build: post-both-clamps ACTION-space sequences
        # (pure elementwise math -> bit-exact vs the mirror); the rate-space
        # noise reconstructs with the kernel's own back-computation
        solve_a = PR.make_transposed_smppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            emit_perturbed=True,
        )
        _, _, _, ct_a, pert_k = jax.jit(solve_a)(
            bits, x0T, U2, as2, scale_t, mu_t, lo_t, hi_t, alo_t, ahi_t,
            a_flat, lam, w_seq, dt_,
        )
        np.testing.assert_array_equal(np.asarray(ct_a), np.asarray(ct_k))
        np.testing.assert_allclose(np.asarray(pert_k.T),
                                   np.asarray(pert_act),
                                   rtol=1e-5, atol=1e-7)
        noise_rec = (pert_k.T - as2[None]) / dt_ - U2[None]
        np.testing.assert_allclose(np.asarray(noise_rec),
                                   np.asarray(noise2),
                                   rtol=1e-5, atol=1e-6)

    def test_kmppi_variant(self):
        """KMPPI transposed kernel vs plain jnp: support-point noise,
        in-kernel interpolation matmul, trajectory clamp, theta-space
        update."""
        nsp = 4
        Dp = nsp * NU
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_support_pts=nsp)
        from pytorch_mppi_tpu.ops.kernels import (RBFKernel,
                                                  interpolation_operators)

        interp_full, _ = interpolation_operators(RBFKernel(2.0), T, nsp, DT)
        Wt = jnp.kron(interp_full, jnp.eye(NU, dtype=DT))  # (D, Dp)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (Dp, K), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_kmppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        th2 = jax.random.normal(jax.random.PRNGKey(6), (Dp,), DT) * 0.2
        scale_p = jnp.full((Dp,), 0.9, DT)
        mu_p = jnp.zeros((Dp,), DT)
        lop = jnp.full((Dp,), -1.0, DT)
        hip = jnp.full((Dp,), 1.0, DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam = jnp.asarray(0.9, DT)
        x0 = jnp.array([-2.0, -1.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        delta_k, m_k, s_k, ct_k = jax.jit(solve)(
            bits, x0T, U2, th2, scale_p, mu_p, lop, hip, lo_t, hi_t, a_flat,
            Wt, lam,
        )

        z = PR._bits_to_normal(bits)
        noise_th = z.T * scale_p[None]
        pert_pts = jnp.clip(th2[None] + noise_th, lop, hip)
        noise_th = pert_pts - th2[None]
        pert2 = jnp.clip(pert_pts @ Wt.T, lo_t, hi_t)
        noise2 = pert2 - U2[None]
        pc = noise2 @ a_flat
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None, x0,
                                   pert2.reshape(K, T, NU),
                                   jax.random.PRNGKey(0))
        ct_m = rc + pc
        logits = -ct_m / lam
        m_m = jnp.max(logits)
        w = jnp.exp(logits - m_m)
        s_m = jnp.sum(w)
        delta_m = (w / s_m) @ noise_th
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(delta_k) / float(s_k),
                                   np.asarray(delta_m), rtol=2e-3, atol=1e-5)

        # artifact-emitting build: post-trajectory-clamp full-horizon actions
        # (the in-kernel interpolation matmul makes this allclose rather than
        # bit-exact vs the mirror's pert_pts @ Wt.T); the full-horizon noise
        # artifact is perturbed - U by definition
        solve_a = PR.make_transposed_kmppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            emit_perturbed=True,
        )
        delta_a, _, _, ct_a, pert_k = jax.jit(solve_a)(
            bits, x0T, U2, th2, scale_p, mu_p, lop, hip, lo_t, hi_t, a_flat,
            Wt, lam,
        )
        np.testing.assert_array_equal(np.asarray(ct_a), np.asarray(ct_k))
        np.testing.assert_array_equal(np.asarray(delta_a), np.asarray(delta_k))
        np.testing.assert_allclose(np.asarray(pert_k.T), np.asarray(pert2),
                                   rtol=2e-5, atol=2e-6)

    def test_batched_variant(self):
        """N-plant batched transposed kernel vs the plain-jnp mirror:
        shared noise across plants, per-plant softmax and update."""
        N = 3
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_batched_solve(
            config, N, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False)
        U = jax.random.normal(jax.random.PRNGKey(5), (N, T, NU), DT) * 0.1
        x0 = jnp.asarray([[-3.0, -2.0], [1.0, 1.0], [0.5, -0.5]], DT)
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        lam = jnp.asarray(1.0, DT)
        sigma_inv = jnp.eye(NU, dtype=DT) / 0.64  # matches scale=0.8 chol
        a2 = (lam * jnp.einsum("ntu,vu->ntv", U, sigma_inv)).reshape(N, D)
        delta, ms, ct_k = jax.jit(solve)(
            bits, x0.T, U.reshape(N, D).T, scale_t, mu_t, lo_t, hi_t, a2.T,
            lam,
        )

        z = PR._bits_to_normal(bits)
        noise_shared = z.T * scale_t[None]  # (K, D) — ONE draw for all plants
        U2 = U.reshape(N, D)
        pert = jnp.clip(U2[:, None] + noise_shared[None], lo_t, hi_t)
        noise = pert - U2[:, None]
        pc = jnp.einsum("nkd,nd->nk", noise, a2)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        rcs = []
        for n in range(N):
            rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None, None,
                                       x0[n], pert[n].reshape(K, T, NU),
                                       jax.random.PRNGKey(0))
            rcs.append(rc)
        ct_m = jnp.stack(rcs) + pc  # (N, K)
        _, om = S.compute_weighting(ct_m, lam, axis=1)
        delta_m = jnp.einsum("nk,nkd->nd", om, noise)
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray((delta / ms[1][None]).T),
                                   np.asarray(delta_m), rtol=2e-4, atol=2e-6)
        # per-plant normalizers are all positive and distinct
        assert (np.asarray(ms[1]) > 0).all()

    def test_batched_noise_operand_matches_bits_mode(self):
        """The noise-operand sampling mode (one XLA draw passed as a
        (D, K_pad) operand, no in-kernel sampling work) must be bit-identical
        to the bits-injection mode fed the same underlying draw — every step
        after the draw (clip, rollout, flash-softmax, update) is shared."""
        N = 3
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        solve_bits = PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, rng_in_kernel=False)
        solve_op = PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, noise_operand=True)
        assert solve_op.noise_operand and not solve_bits.noise_operand

        U = jax.random.normal(jax.random.PRNGKey(5), (N, T, NU), DT) * 0.1
        x0 = jnp.asarray([[-3.0, -2.0], [1.0, 1.0], [0.5, -0.5]], DT)
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        lam = jnp.asarray(1.0, DT)
        sigma_inv = jnp.eye(NU, dtype=DT) / 0.64
        a2 = (lam * jnp.einsum("ntu,vu->ntv", U, sigma_inv)).reshape(N, D)
        args = (x0.T, U.reshape(N, D).T, scale_t, mu_t, lo_t, hi_t, a2.T, lam)

        delta_b, ms_b, ct_b = jax.jit(solve_bits)(bits, *args)
        # the operand is the FINAL noise: the same draw pushed through the
        # identical bits->normal map and diagonal correlation outside (jit
        # fusion makes the multiply-add an FMA on one side, so last-ulp
        # tolerances rather than bit equality)
        noiseT = PR._bits_to_normal(bits) * scale_t[:, None] + mu_t[:, None]
        delta_o, ms_o, ct_o = jax.jit(solve_op)(noiseT, *args)

        np.testing.assert_allclose(np.asarray(ct_o), np.asarray(ct_b),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(delta_o), np.asarray(delta_b),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ms_o), np.asarray(ms_b),
                                   rtol=1e-5, atol=0)

        # the two flags are distinct sampling modes, not composable
        with pytest.raises(ValueError, match="mutually exclusive"):
            PR.make_transposed_batched_solve(
                config, N, wdyn, wcost, rng_in_kernel=False,
                noise_operand=True)

    @pytest.mark.parametrize("antithetic", [False, True])
    def test_batched_noise_operand_through_controller_plumbing(self, antithetic):
        """solve.py's _one_iteration_fused honors a noise-operand override
        kernel (the attribute-gated branch samples once with
        sample_noise_flat and pads/transposes to (D, K_pad)): the full
        batched step must match the XLA scan path given the same key — both
        sample the IDENTICAL stream with sample_noise_flat, so only layout
        (batch-last rollout, flash-softmax) separates them.  With
        ``antithetic`` the mirroring happens in that one shared draw (the
        kernel's own in-block mirroring is bypassed in operand mode)."""
        N = 2
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            antithetic=antithetic)
        from pytorch_mppi_tpu.config import MPPIParams
        from pytorch_mppi_tpu.ops.solve import BatchedState, make_batched_step

        params = MPPIParams(
            noise_mu=jnp.zeros(NU, DT),
            noise_sigma=jnp.eye(NU, dtype=DT) * 0.64,
            lambda_=jnp.asarray(1.0, DT),
            u_min=jnp.full((NU,), -1.0, DT),
            u_max=jnp.full((NU,), 1.0, DT),
            u_init=jnp.zeros(NU, DT),
        )
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        solve_op = PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, noise_operand=True)
        fns_xla = make_batched_step(config, N, lin_dyn, quad_cost, jit=False)
        fns_op = make_batched_step(config, N, lin_dyn, quad_cost, jit=False,
                                   transposed_solve_override=solve_op)

        U0 = jax.random.normal(jax.random.PRNGKey(9), (N, T, NU), DT) * 0.1
        state = BatchedState(U=U0, key=jax.random.PRNGKey(7))
        x0 = jnp.asarray([[-3.0, -2.0], [1.0, 1.0]], DT)

        s_x, a_x, art_x = fns_xla.step(params, state, x0)
        s_o, a_o, art_o = fns_op.step(params, state, x0)
        np.testing.assert_allclose(np.asarray(art_o.cost_total),
                                   np.asarray(art_x.cost_total),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_o.U), np.asarray(s_x.U),
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(a_o), np.asarray(a_x),
                                   rtol=2e-4, atol=2e-6)

    def test_batched_override_rejects_guarded_configs(self):
        """The override hook bypasses the use_pallas route's guards, so
        configs those guards protect (fused_artifacts, meshed steps) must
        fail loud instead of silently dropping artifacts/sharding."""
        from pytorch_mppi_tpu.ops.solve import make_batched_step

        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT,
                            diag_sigma=True, fused_artifacts=True)
        with pytest.raises(ValueError, match="transposed_solve_override"):
            make_batched_step(config, 2, lin_dyn, quad_cost,
                              transposed_solve_override=object())

    def test_batched_controller_falls_back_on_cpu(self):
        """MPPI_Batched(use_pallas=True) on CPU: bit-identical fallback."""
        from pytorch_mppi_tpu import MPPI_Batched

        kw = dict(num_envs=2, num_samples=64, horizon=5, seed=3)
        c_ref = MPPI_Batched(lin_dyn, quad_cost, 2, jnp.eye(2, dtype=DT), **kw)
        c_pal = MPPI_Batched(lin_dyn, quad_cost, 2, jnp.eye(2, dtype=DT),
                             use_pallas=True, **kw)
        states = jnp.asarray([[-3.0, -2.0], [1.0, 1.0]], DT)
        np.testing.assert_array_equal(
            np.asarray(c_ref.command(states)), np.asarray(c_pal.command(states))
        )

    @pytest.mark.parametrize("use_pallas,want_operand", [
        (True, True), ("kernel_rng", False),
    ])
    def test_batched_routing_sampling_mode(self, monkeypatch, use_pallas,
                                           want_operand):
        """use_pallas=True routes the batched fused kernel to the
        measured-best noise-operand sampling mode (round-3 A/B,
        benchmarks/batched_modes.py); use_pallas="kernel_rng" selects the
        in-kernel regeneration mode.  The builder kwargs are captured via a
        recorder (kernels never compile on CPU, so only routing is pinned)."""
        from pytorch_mppi_tpu.ops import solve as SV

        seen = {}

        def recorder(config, N, dyn, cost, **kw):
            seen.update(kw)
            raise SV.FusedSolveUnavailable("routing probe")

        monkeypatch.setattr(PR, "_interpret", lambda: False)
        monkeypatch.setattr(PR, "make_transposed_batched_solve", recorder)
        config = MPPIConfig(nx=NX, nu=NU, K=2048, T=T, dtype=DT,
                            diag_sigma=True)
        fns = SV.make_batched_step(config, 2, lin_dyn, quad_cost, jit=False,
                                   use_pallas=use_pallas)
        assert fns.step is not None  # XLA fallback after the probe
        assert seen.get("noise_operand") is want_operand

    def test_batched_small_k_auto_routes_to_xla(self, monkeypatch, caplog):
        """use_pallas=True below the measured K crossover (round-3 A/B:
        XLA wins for K < ~2048) auto-routes to the XLA scan path with an
        info log; 'force' and 'kernel_rng' keep the kernel."""
        import logging

        from pytorch_mppi_tpu.ops import solve as SV

        calls = []

        def recorder(config, N, dyn, cost, **kw):
            calls.append(kw)
            raise SV.FusedSolveUnavailable("routing probe")

        monkeypatch.setattr(PR, "_interpret", lambda: False)
        monkeypatch.setattr(PR, "make_transposed_batched_solve", recorder)
        config = MPPIConfig(nx=NX, nu=NU, K=1024, T=T, dtype=DT,
                            diag_sigma=True)
        with caplog.at_level(logging.INFO):
            fns = SV.make_batched_step(config, 2, lin_dyn, quad_cost,
                                       jit=False, use_pallas=True)
        assert fns.step is not None
        assert calls == []  # kernel builder never invoked
        assert any("use_pallas='force'" in r.getMessage()
                   for r in caplog.records)
        # explicit modes bypass the auto-route (with the crossover warning)
        for mode, want_operand in (("force", True), ("kernel_rng", False)):
            calls.clear()
            SV.make_batched_step(config, 2, lin_dyn, quad_cost, jit=False,
                                 use_pallas=mode)
            assert calls and calls[0].get("noise_operand") is want_operand

    def test_sharded_solve_matches_unsharded(self):
        """The K-sharded fused solve (per-shard kernels + pmax/psum
        flash-stat merge over an 8-virtual-device 'k' mesh) must match the
        single-device kernel bit-for-bit given identical injected bits — the
        flash merge rule is exact up to summation association."""
        import jax

        from pytorch_mppi_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh((8,), ("k",))
        KS = 1024  # 128 per shard, one 128-lane block each
        config = MPPIConfig(nx=NX, nu=NU, K=KS, T=T, dtype=DT, diag_sigma=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, KS), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        scale_t = jnp.full((D,), 0.8, DT)
        zero = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam = jnp.asarray(1.0, DT)
        x0 = jnp.array([-3.0, -2.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, KS))

        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        sharded = S.make_sharded_transposed_solve(
            config, wdyn, wcost, mesh, "k", rng_in_kernel=False)
        d_s, m_s, s_s, ct_s = jax.jit(sharded)(
            bits, x0T, U2, scale_t, zero, lo_t, hi_t, a_flat, lam)

        single = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False)
        d_1, m_1, s_1, ct_1 = jax.jit(single)(
            bits, x0T, U2, scale_t, zero, lo_t, hi_t, a_flat, lam)

        np.testing.assert_allclose(np.asarray(ct_s), np.asarray(ct_1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(m_s), float(m_1), rtol=1e-7)
        np.testing.assert_allclose(float(s_s), float(s_1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d_s) / float(s_s), np.asarray(d_1) / float(s_1),
            rtol=1e-4, atol=1e-7,
        )

    def test_sharded_variant_solves_match_unsharded(self):
        """The generalized shard wrapper also covers the SMPPI and KMPPI
        kernels: identical injected bits, sharded vs single-device, must
        agree (rate-/theta-space deltas merge exactly like the plain one)."""
        import jax

        from pytorch_mppi_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh((8,), ("k",))
        KS = 1024
        wdyn_factory = lambda cfg: S.wrap_dynamics(cfg, lin_dyn)
        wcost_factory = lambda cfg: S.wrap_cost(cfg, quad_cost)

        # --- SMPPI (null gate + artifact emit active on the sharded path) ---
        cfg = MPPIConfig(nx=NX, nu=NU, K=KS, T=T, dtype=DT, diag_sigma=True,
                         sample_null_action=True, fused_artifacts=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, KS), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        as2 = jax.random.normal(jax.random.PRNGKey(6), (D,), DT) * 0.2
        ones = jnp.ones((D,), DT)
        args = (U2, as2, 0.8 * ones, 0 * ones, -2 * ones, 2 * ones, -ones,
                ones, U2 * 0.7, jnp.asarray(1.0, DT), jnp.asarray(5.0, DT),
                jnp.asarray(0.5, DT))
        x0T = jnp.broadcast_to(jnp.array([-1.0, -1.0], DT)[:, None], (NX, KS))
        sh = S.make_sharded_smppi_solve(cfg, wdyn_factory(cfg),
                                        wcost_factory(cfg), mesh, "k",
                                        rng_in_kernel=False)
        d_s, m_s, s_s, ct_s, pa_s = jax.jit(sh)(bits, x0T, *args)
        un = PR.make_transposed_smppi_solve(cfg, wdyn_factory(cfg),
                                            wcost_factory(cfg),
                                            rng_in_kernel=False,
                                            emit_perturbed=True)
        d_1, m_1, s_1, ct_1, pa_1 = jax.jit(un)(bits, x0T, *args)
        np.testing.assert_allclose(np.asarray(ct_s), np.asarray(ct_1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d_s) / float(s_s), np.asarray(d_1) / float(s_1),
            rtol=1e-4, atol=1e-7)
        # emitted action sequences agree; sample 0 is the (clamped) null
        np.testing.assert_allclose(np.asarray(pa_s), np.asarray(pa_1),
                                   rtol=1e-6, atol=1e-7)
        assert np.abs(np.asarray(pa_s)[:, 0]).max() == 0.0

        # --- KMPPI ---
        nsp = 4
        Dp = nsp * NU
        cfg_k = MPPIConfig(nx=NX, nu=NU, K=KS, T=T, dtype=DT, diag_sigma=True,
                           num_support_pts=nsp, sample_null_action=True,
                           fused_artifacts=True)
        from pytorch_mppi_tpu.ops.kernels import (RBFKernel,
                                                  interpolation_operators)

        interp_full, _ = interpolation_operators(RBFKernel(2.0), T, nsp, DT)
        Wt = jnp.kron(interp_full, jnp.eye(NU, dtype=DT))
        bits_k = jax.random.randint(
            jax.random.PRNGKey(7), (Dp, KS), -(2**31), 2**31 - 1, jnp.int32)
        th2 = jax.random.normal(jax.random.PRNGKey(8), (Dp,), DT) * 0.2
        onep = jnp.ones((Dp,), DT)
        argk = (U2, th2, 0.9 * onep, 0 * onep, -onep, onep, -ones, ones,
                U2 * 0.7, Wt, jnp.asarray(0.9, DT))
        shk = S.make_sharded_kmppi_solve(cfg_k, wdyn_factory(cfg_k),
                                         wcost_factory(cfg_k), mesh, "k",
                                         rng_in_kernel=False)
        dk_s, mk_s, sk_s, ctk_s, pk_s = jax.jit(shk)(bits_k, x0T, *argk)
        unk = PR.make_transposed_kmppi_solve(cfg_k, wdyn_factory(cfg_k),
                                             wcost_factory(cfg_k),
                                             rng_in_kernel=False,
                                             emit_perturbed=True)
        dk_1, mk_1, sk_1, ctk_1, pk_1 = jax.jit(unk)(bits_k, x0T, *argk)
        np.testing.assert_allclose(np.asarray(ctk_s), np.asarray(ctk_1),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(dk_s) / float(sk_s), np.asarray(dk_1) / float(sk_1),
            rtol=1e-3, atol=1e-6)
        # emitted full-horizon trajectories agree; sample 0 is the null
        np.testing.assert_allclose(np.asarray(pk_s), np.asarray(pk_1),
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(pk_s)[:, 0]).max() == 0.0

    def test_gate_arity_is_loud(self):
        """A gate argument passed to a kernel built WITHOUT
        null_dynamic_gate=True must raise, not be silently swallowed by the
        ``*gate`` varargs (which would statically inject one null sample per
        shard instead of one global)."""
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT,
                            diag_sigma=True, sample_null_action=True)
        bits = jnp.zeros((D, K), jnp.int32)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        ungated = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False)
        zero = jnp.zeros((D,), DT)
        one = jnp.ones((D,), DT)
        x0T = jnp.zeros((NX, K), DT)
        args = (bits, x0T, zero, one, zero, -one, one, zero,
                jnp.asarray(1.0, DT))
        with pytest.raises(TypeError, match="null_dynamic_gate"):
            ungated(*args, jnp.ones((1,), jnp.int32))
        gated = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False, null_dynamic_gate=True)
        with pytest.raises(TypeError, match="null_dynamic_gate"):
            gated(*args)

    def test_sharded_null_action_and_artifacts(self):
        """sample_null_action + fused_artifacts on the K-sharded fused solve:
        the per-shard kernels' dynamic null gate must zero exactly global
        sample 0 (only shard 0 fires), matching the single-device kernel's
        static injection; the emitted perturbed tensor concatenates across
        shards into the global (D, K)."""
        import jax

        from pytorch_mppi_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh((8,), ("k",))
        KS = 1024
        config = MPPIConfig(nx=NX, nu=NU, K=KS, T=T, dtype=DT,
                            diag_sigma=True, sample_null_action=True,
                            fused_artifacts=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, KS), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        scale_t = jnp.full((D,), 0.8, DT)
        zero = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam = jnp.asarray(1.0, DT)
        x0T = jnp.broadcast_to(jnp.array([-3.0, -2.0], DT)[:, None], (NX, KS))

        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        sharded = S.make_sharded_transposed_solve(
            config, wdyn, wcost, mesh, "k", rng_in_kernel=False)
        d_s, m_s, s_s, ct_s, pert_s = jax.jit(sharded)(
            bits, x0T, U2, scale_t, zero, lo_t, hi_t, a_flat, lam)

        single = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False, emit_perturbed=True)
        d_1, m_1, s_1, ct_1, pert_1 = jax.jit(single)(
            bits, x0T, U2, scale_t, zero, lo_t, hi_t, a_flat, lam)

        # global sample 0 is the null action (bounds straddle 0 -> exactly 0)
        assert np.asarray(pert_s)[:, 0].max() == 0.0
        assert np.asarray(pert_s)[:, 0].min() == 0.0
        # and it is the ONLY null sample (noise makes all-zero columns
        # elsewhere improbable to the point of impossibility)
        zero_cols = (np.abs(np.asarray(pert_s)) < 1e-12).all(axis=0)
        assert zero_cols.sum() == 1 and zero_cols[0]
        np.testing.assert_allclose(np.asarray(ct_s), np.asarray(ct_1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pert_s), np.asarray(pert_1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(d_s) / float(s_s), np.asarray(d_1) / float(s_1),
            rtol=1e-4, atol=1e-7,
        )

    def test_sharded_batched_solve_matches_unsharded(self):
        """Env-sharded batched fused solve (plants over 'data', ZERO
        collectives) vs the single-device batched kernel with identical
        bits: shared noise must hold across the shard boundary."""
        import jax

        from pytorch_mppi_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh((8,), ("data",))
        N = 16  # 2 plants per shard
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U = jax.random.normal(jax.random.PRNGKey(5), (N, T, NU), DT) * 0.1
        x0 = jax.random.uniform(jax.random.PRNGKey(6), (N, NX), DT, -2.0, 2.0)
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        a2 = (lam * U / 0.64).reshape(N, D)  # sigma_inv of diag 0.64... scale
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)

        sh = S.make_sharded_batched_solve(config, N, wdyn, wcost, mesh,
                                          "data", rng_in_kernel=False)
        d_s, ms_s, ct_s = jax.jit(sh)(
            bits, x0.T, U.reshape(N, D).T, 0.8 * ones, 0 * ones, -ones,
            ones, a2.T, lam)

        un = PR.make_transposed_batched_solve(config, N, wdyn, wcost,
                                              rng_in_kernel=False)
        d_1, ms_1, ct_1 = jax.jit(un)(
            bits, x0.T, U.reshape(N, D).T, 0.8 * ones, 0 * ones, -ones,
            ones, a2.T, lam)
        np.testing.assert_allclose(np.asarray(ct_s), np.asarray(ct_1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d_s / ms_s[1][None]), np.asarray(d_1 / ms_1[1][None]),
            rtol=1e-4, atol=1e-6)

    def test_sharded_batched_noise_operand_matches_unsharded(self):
        """Env-sharded batched solve in noise-operand mode: the one shared
        (D, K_pad) draw is replicated across shards, so outputs must be
        BIT-identical to the single-device operand kernel (identical inputs
        and identical per-shard kernel code — only the shard_map wrapper
        differs)."""
        import jax

        from pytorch_mppi_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh((8,), ("data",))
        N = 16
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        noiseT = jax.random.normal(jax.random.PRNGKey(3), (D, K), DT) * 0.8
        U = jax.random.normal(jax.random.PRNGKey(5), (N, T, NU), DT) * 0.1
        x0 = jax.random.uniform(jax.random.PRNGKey(6), (N, NX), DT, -2.0, 2.0)
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        a2 = (lam * U / 0.64).reshape(N, D)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)

        sh = S.make_sharded_batched_solve(config, N, wdyn, wcost, mesh,
                                          "data", noise_operand=True)
        assert sh.noise_operand and sh.K_pad == K
        d_s, ms_s, ct_s = jax.jit(sh)(
            noiseT, x0.T, U.reshape(N, D).T, 0.8 * ones, 0 * ones, -ones,
            ones, a2.T, lam)

        un = PR.make_transposed_batched_solve(config, N, wdyn, wcost,
                                              noise_operand=True)
        d_1, ms_1, ct_1 = jax.jit(un)(
            noiseT, x0.T, U.reshape(N, D).T, 0.8 * ones, 0 * ones, -ones,
            ones, a2.T, lam)
        np.testing.assert_array_equal(np.asarray(ct_s), np.asarray(ct_1))
        np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_1))
        np.testing.assert_array_equal(np.asarray(ms_s), np.asarray(ms_1))

    def test_padded_k(self):
        """K not a multiple of the 128-lane block: phantom rows must carry
        zero weight."""
        config = MPPIConfig(nx=NX, nu=NU, K=100, T=T, dtype=DT,
                            diag_sigma=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, 128), -(2**31), 2**31 - 1, jnp.int32
        )
        solve = PR.make_transposed_fused_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
        )
        x0T = jnp.broadcast_to(jnp.array([-1.0, 0.5], DT)[:, None], (NX, 100))
        U2 = jnp.zeros((D,), DT)
        ones = jnp.ones((D,), DT)
        delta, m, s_, ct = jax.jit(solve)(
            bits, x0T, U2, ones, 0 * ones, -ones, ones, 0 * ones,
            jnp.asarray(1.0, DT),
        )
        assert ct.shape == (100,)
        assert np.isfinite(np.asarray(ct)).all()
        # s is the sum of 100 weights each <= 1
        assert 0 < float(s_) <= 100.0


class TestFuzzFused:
    """End-to-end fuzz of the fused solve: random dynamics/cost programs from
    the shared generator (tests/fuzz_programs.py) through
    ``make_transposed_fused_solve`` (interpret mode, injected bits) vs the
    plain-jnp mirror of the same math.  Exercises the batch-last interpreter
    INSIDE the kernel's traced rollout, at random (nx, nu), where a silent
    layout bug would corrupt real users' fused solves."""

    @pytest.mark.parametrize("seed", range(8))
    def test_random_dynamics_and_cost(self, seed):
        from fuzz_programs import gen_program

        rng = np.random.RandomState(2000 + seed)
        nx = int(rng.randint(1, 5))
        nu = int(rng.randint(1, 4))
        core, _, _ = gen_program(rng, force_kind="dynamics", nx=nx, nu=nu,
                                 dtype=DT)
        cost_core, _, _ = gen_program(rng, force_kind="cost", nx=nx, nu=nu,
                                      dtype=DT)

        def dyn(s, a):
            # residual + tanh squash keeps T rollout steps bounded whatever
            # the random core does
            return s + 0.1 * jnp.tanh(core(s, a))

        def cost(s, a):
            return jnp.abs(cost_core(s, a)) + (s**2).sum(axis=-1)

        Kf, Tf = 256, 5
        Df = Tf * nu
        config = MPPIConfig(nx=nx, nu=nu, K=Kf, T=Tf, dtype=DT,
                            diag_sigma=True)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, cost)
        try:
            solve = PR.make_transposed_fused_solve(config, wdyn, wcost,
                                                   rng_in_kernel=False)
        except UnsupportedPrimitive as e:  # pragma: no cover
            pytest.fail(f"generator produced out-of-vocabulary program: {e}")

        bits = jax.random.randint(
            jax.random.PRNGKey(seed), (Df, Kf), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(seed + 50), (Df,), DT) * 0.1
        scale_t = jnp.full((Df,), 0.6, DT)
        mu_t = jnp.zeros((Df,), DT)
        lo_t = jnp.full((Df,), -1.5, DT)
        hi_t = jnp.full((Df,), 1.5, DT)
        a_flat = U2 * 0.5
        lam = jnp.asarray(1.0, DT)
        x0 = jnp.asarray(rng.randn(nx), DT)
        x0T = jnp.broadcast_to(x0[:, None], (nx, Kf))

        delta_k, m_k, s_k, ct_k = jax.jit(solve)(
            bits, x0T, U2, scale_t, mu_t, lo_t, hi_t, a_flat, lam)

        # the module's shared mirror is the oracle (covers every config
        # branch the targeted tests pin — no drift between the two)
        ct_m, m_m, s_m, delta_m, _ = _mirror(
            config, dyn, cost, bits, x0, U2, scale_t, mu_t, lo_t, hi_t,
            a_flat, lam)

        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(delta_k) / float(s_k),
                                   np.asarray(delta_m), rtol=2e-4, atol=2e-6)


class TestFuzzBatched:
    """Fuzz of the N-plant batched kernel: random dynamics/cost programs
    through ``make_transposed_batched_solve`` (interpret mode, injected bits)
    vs a per-plant plain-jnp mirror.  Exercises the batched kernel's own
    machinery — per-plant column selection via one-hot lane masks, shared
    noise across plants, per-plant flash-softmax, masked output
    read-modify-write — under random (nx, nu) programs."""

    @pytest.mark.parametrize("seed", range(4))
    def test_random_dynamics_and_cost(self, seed):
        from fuzz_programs import gen_program

        rng = np.random.RandomState(3000 + seed)
        nx = int(rng.randint(1, 5))
        nu = int(rng.randint(1, 4))
        core, _, _ = gen_program(rng, force_kind="dynamics", nx=nx, nu=nu,
                                 dtype=DT)
        cost_core, _, _ = gen_program(rng, force_kind="cost", nx=nx, nu=nu,
                                      dtype=DT)

        def dyn_f(s, a):
            return s + 0.1 * jnp.tanh(core(s, a))

        def cost_f(s, a):
            return jnp.abs(cost_core(s, a)) + (s**2).sum(axis=-1)

        N, Kf, Tf = 3, 256, 5
        Df = Tf * nu
        config = MPPIConfig(nx=nx, nu=nu, K=Kf, T=Tf, dtype=DT,
                            diag_sigma=True)
        wdyn = S.wrap_dynamics(config, dyn_f)
        wcost = S.wrap_cost(config, cost_f)
        try:
            solve = PR.make_transposed_batched_solve(
                config, N, wdyn, wcost, rng_in_kernel=False)
        except UnsupportedPrimitive as e:  # pragma: no cover
            pytest.fail(f"generator produced out-of-vocabulary program: {e}")

        bits = jax.random.randint(
            jax.random.PRNGKey(seed), (Df, Kf), -(2**31), 2**31 - 1,
            jnp.int32)
        U = jax.random.normal(jax.random.PRNGKey(seed + 50), (N, Tf, nu),
                              DT) * 0.1
        x0 = jnp.asarray(rng.randn(N, nx), DT)
        scale_t = jnp.full((Df,), 0.6, DT)
        mu_t = jnp.zeros((Df,), DT)
        lo_t = jnp.full((Df,), -1.5, DT)
        hi_t = jnp.full((Df,), 1.5, DT)
        lam = jnp.asarray(1.0, DT)
        a2 = (lam * U.reshape(N, Df) * 0.5)

        delta_k, ms_k, ct_k = jax.jit(solve)(
            bits, x0.T, U.reshape(N, Df).T, scale_t, mu_t, lo_t, hi_t,
            a2.T, lam)

        # per-plant plain-jnp mirror: ONE shared draw, per-plant clamp +
        # rollout + softmax (reference mppi.py:837-868 semantics)
        z = PR._bits_to_normal(bits)
        noise_shared = z.T * scale_t[None]
        U2 = U.reshape(N, Df)
        pert = jnp.clip(U2[:, None] + noise_shared[None], lo_t, hi_t)
        noise = pert - U2[:, None]
        pc = jnp.einsum("nkd,nd->nk", noise, a2)
        rcs = []
        for n in range(N):
            rc, _, _ = S.rollout_costs(config, wdyn, wcost, None, None,
                                       None, x0[n],
                                       pert[n].reshape(Kf, Tf, nu),
                                       jax.random.PRNGKey(0))
            rcs.append(rc)
        ct_m = jnp.stack(rcs) + pc
        _, om = S.compute_weighting(ct_m, lam, axis=1)
        delta_m = jnp.einsum("nk,nkd->nd", om, noise)
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray((delta_k / ms_k[1][None]).T),
                                   np.asarray(delta_m), rtol=2e-4, atol=2e-6)


class TestTerminalFinalKernel:
    """Final-state terminal cost inside the transposed kernels
    (``terminal_final=``, see solve.wrap_final_cost): the terminal jaxpr is
    traced like the body, its closure constants hoisted through the same
    kernel-input list, and it evaluates batch-axis-last on the FINAL rollout
    state and final scaled action — pinned against the XLA mirror with
    injected bits."""

    W = jnp.array([3.0, 1.0], DT)

    @classmethod
    def _fterm(cls, s, a):
        # closure constants (W, GOAL) exercise the terminal-consts hoisting
        return (cls.W * (s - GOAL) ** 2).sum(axis=-1) + 0.2 * (a ** 2).sum(axis=-1)

    def _operands(self, config):
        bh = config.K // 2 if config.antithetic else config.K
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, bh), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        return bits, U2

    @pytest.mark.parametrize("dyn", [lin_dyn, mlp_dyn])
    def test_mppi_parity(self, dyn):
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            u_scale=0.9)
        bits, U2 = self._operands(config)
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.full((D,), 0.05, DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam = jnp.asarray(1.0, DT)
        x0 = jnp.array([-3.0, -2.0], DT)
        wdyn = S.wrap_dynamics(config, dyn)
        wcost = S.wrap_cost(config, quad_cost)
        wterm = S.wrap_final_cost(self._fterm)

        solve = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False, terminal_final=wterm)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        delta_k, m_k, s_k, ct_k = jax.jit(solve)(
            bits, x0T, U2, scale_t, mu_t, lo_t, hi_t, a_flat, lam)

        z = PR._bits_to_normal(bits)
        noise2 = z.T * scale_t[None] + mu_t[None]
        perturbed2 = jnp.clip(U2[None] + noise2, lo_t, hi_t)
        noise2 = perturbed2 - U2[None]
        rc, _, _ = S.rollout_costs(
            config, wdyn, wcost, None, None, None, x0,
            perturbed2.reshape(K, T, NU) * 1.0, jax.random.PRNGKey(0),
            terminal_final_cost=wterm)
        ct_m = rc + noise2 @ a_flat
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=1e-5)
        logits = -ct_m / lam
        m_m = jnp.max(logits)
        w = jnp.exp(logits - m_m)
        np.testing.assert_allclose(float(s_k), float(jnp.sum(w)), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(delta_k) / float(s_k),
            np.asarray((w / jnp.sum(w)) @ noise2), rtol=2e-4, atol=2e-6)

    def test_batched_parity(self):
        N = 2
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        bits, U2 = self._operands(config)
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        lam = jnp.asarray(1.0, DT)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        wterm = S.wrap_final_cost(self._fterm)

        z = PR._bits_to_normal(bits)
        noise_shared = z.T * scale_t[None] + mu_t[None]  # (K, D)
        solve = PR.make_transposed_batched_solve(
            config, N, wdyn, wcost, noise_operand=True, terminal_final=wterm)
        x0 = jnp.array([[-3.0, -2.0], [2.0, 1.0]], DT)
        U2N = jnp.stack([U2, -U2], axis=1)
        aN = jnp.stack([U2 * 0.7, -U2 * 0.7], axis=1)
        delta, ms, ct = jax.jit(solve)(
            noise_shared.T, x0.T, U2N, scale_t, mu_t, lo_t, hi_t, aN, lam)

        for n in range(N):
            U_n = U2N[:, n]
            pert = jnp.clip(U_n[None] + noise_shared, lo_t, hi_t)
            nse = pert - U_n[None]
            rc, _, _ = S.rollout_costs(
                config, wdyn, wcost, None, None, None, x0[n],
                pert.reshape(K, T, NU) * 1.0, jax.random.PRNGKey(0),
                terminal_final_cost=wterm)
            ct_m = rc + nse @ aN[:, n]
            np.testing.assert_allclose(np.asarray(ct[n]), np.asarray(ct_m),
                                       rtol=2e-5, atol=2e-5)

    def test_unsupported_terminal_raises_at_build(self):
        """A terminal fn outside the batch-last vocabulary fails LOUDLY at
        build time (UnsupportedPrimitive) — the routing layer catches it and
        falls back to the XLA scan path."""
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)

        def weird_term(s, a):
            return jnp.sort(s, axis=-1)[..., 0]  # lax.sort: not in vocabulary

        with pytest.raises(UnsupportedPrimitive):
            PR.make_transposed_fused_solve(
                config, S.wrap_dynamics(config, lin_dyn),
                S.wrap_cost(config, quad_cost), rng_in_kernel=False,
                terminal_final=S.wrap_final_cost(weird_term))


class TestEliteOperandKernel:
    """Elite reuse inside the transposed kernel (``MPPIConfig.num_elites`` +
    ``fused_artifacts``, docs/DESIGN.md §11): the shifted elites ride a
    (D, 128) operand whose columns sit at their global sample indices; block
    0 overwrites those columns before the clamp — pinned against the XLA
    pipeline with identical injection."""

    @pytest.mark.parametrize("null", [False, True])
    def test_parity_with_xla_injection(self, null):
        E = 3
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_elites=E, sample_null_action=null)
        wdyn = S.wrap_dynamics(config, lin_dyn)
        wcost = S.wrap_cost(config, quad_cost)
        solve = PR.make_transposed_fused_solve(
            config, wdyn, wcost, rng_in_kernel=False, emit_perturbed=True)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        a_flat = U2 * 0.7
        x0 = jnp.array([-3.0, -2.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        elites = jax.random.normal(jax.random.PRNGKey(9), (E, T, NU), DT) * 2.0
        off = 1 if null else 0
        el_op = jnp.zeros((D, 128), DT).at[:, off:off + E].set(
            elites.reshape(E, D).T)
        delta, m, s_, ct, pert = jax.jit(solve)(
            bits, x0T, U2, 0.8 * ones, 0.0 * ones, -ones, ones, a_flat, lam,
            el_op)

        z = PR._bits_to_normal(bits)
        noise2 = z.T * 0.8
        pert2 = U2[None] + noise2
        if null:
            pert2 = pert2.at[0].set(0.0)
        pert2 = pert2.at[off:off + E].set(elites.reshape(E, D))
        pert2 = jnp.clip(pert2, -ones, ones)
        noise2 = pert2 - U2[None]
        rc, _, _ = S.rollout_costs(
            config, wdyn, wcost, None, None, None, x0,
            pert2.reshape(K, T, NU), jax.random.PRNGKey(0))
        ct_m = rc + noise2 @ a_flat
        np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_m),
                                   rtol=2e-5, atol=1e-5)
        # the emitted perturbed set holds the injected elite rows exactly
        # (inject-then-clamp, same order as inject_specific_actions)
        np.testing.assert_allclose(np.asarray(pert.T), np.asarray(pert2),
                                   rtol=1e-6, atol=1e-7)

    def test_missing_operand_is_loud(self):
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_elites=2)
        solve = PR.make_transposed_fused_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False)
        bits = jnp.zeros((D, K), jnp.int32)
        ones = jnp.ones((D,), DT)
        with pytest.raises(TypeError, match="elites operand"):
            solve(bits, jnp.zeros((NX, K), DT), jnp.zeros(D, DT), ones,
                  0 * ones, -ones, ones, ones, 1.0)

    def test_injection_window_gate(self):
        from pytorch_mppi_tpu.ops.solve import FusedSolveUnavailable

        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_elites=129)
        with pytest.raises(FusedSolveUnavailable, match="injection window"):
            PR.make_transposed_fused_solve(
                config, S.wrap_dynamics(config, lin_dyn),
                S.wrap_cost(config, quad_cost), rng_in_kernel=False)


class TestTerminalFinalVariantKernels:
    """Terminal-final execution parity for the SMPPI / KMPPI transposed
    kernels (the MPPI and batched kernels are pinned in
    TestTerminalFinalKernel): the terminal jaxpr's consts ride the shared
    hoist list after the body's, and the cost lands on the final
    action-space state/action."""

    WT = jnp.array([2.0, 0.5], DT)

    @classmethod
    def _fterm(cls, s, a):
        return (cls.WT * (s - GOAL) ** 2).sum(axis=-1) + 0.1 * (a ** 2).sum(axis=-1)

    def test_smppi(self):
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            u_scale=1.5)
        wterm = S.wrap_final_cost(self._fterm)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_smppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            terminal_final=wterm)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        as2 = jax.random.normal(jax.random.PRNGKey(6), (D,), DT) * 0.2
        scale_t = jnp.full((D,), 0.8, DT)
        mu_t = jnp.zeros((D,), DT)
        lo_t = jnp.full((D,), -2.0, DT)
        hi_t = jnp.full((D,), 2.0, DT)
        alo_t = jnp.full((D,), -1.0, DT)
        ahi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam, w_seq, dt_ = jnp.asarray(1.0, DT), jnp.asarray(5.0, DT), \
            jnp.asarray(0.5, DT)
        x0 = jnp.array([-1.0, -1.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        _, _, _, ct_k = jax.jit(solve)(
            bits, x0T, U2, as2, scale_t, mu_t, lo_t, hi_t, alo_t, ahi_t,
            a_flat, lam, w_seq, dt_,
        )

        z = PR._bits_to_normal(bits)
        noise2 = z.T * scale_t[None]
        pert_rate = jnp.clip(U2[None] + noise2, lo_t, hi_t)
        pert_act = jnp.clip(as2[None] + pert_rate * dt_, alo_t, ahi_t)
        noise2 = (pert_act - as2[None]) / dt_ - U2[None]
        pc = noise2 @ a_flat
        adiff = 1.5 * (pert_act[:, NU:] - pert_act[:, :-NU])
        smooth = w_seq * jnp.sum(adiff**2, axis=1)
        rc, _, _ = S.rollout_costs(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), None, None, None, x0,
            pert_act.reshape(K, T, NU), jax.random.PRNGKey(0),
            terminal_final_cost=wterm)
        ct_m = rc + pc + smooth
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-5, atol=2e-5)

    def test_kmppi(self):
        nsp = 4
        Dp = nsp * NU
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_support_pts=nsp)
        from pytorch_mppi_tpu.ops.kernels import (RBFKernel,
                                                  interpolation_operators)

        wterm = S.wrap_final_cost(self._fterm)
        interp_full, _ = interpolation_operators(RBFKernel(2.0), T, nsp, DT)
        Wt = jnp.kron(interp_full, jnp.eye(NU, dtype=DT))
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (Dp, K), -(2**31), 2**31 - 1, jnp.int32)
        solve = PR.make_transposed_kmppi_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            terminal_final=wterm)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        th2 = jax.random.normal(jax.random.PRNGKey(6), (Dp,), DT) * 0.2
        scale_p = jnp.full((Dp,), 0.9, DT)
        mu_p = jnp.zeros((Dp,), DT)
        lop = jnp.full((Dp,), -1.0, DT)
        hip = jnp.full((Dp,), 1.0, DT)
        lo_t = jnp.full((D,), -1.0, DT)
        hi_t = jnp.full((D,), 1.0, DT)
        a_flat = U2 * 0.7
        lam = jnp.asarray(0.9, DT)
        x0 = jnp.array([-2.0, -1.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        _, _, _, ct_k = jax.jit(solve)(
            bits, x0T, U2, th2, scale_p, mu_p, lop, hip, lo_t, hi_t, a_flat,
            Wt, lam,
        )

        z = PR._bits_to_normal(bits)
        noise_th = z.T * scale_p[None]
        pert_pts = jnp.clip(th2[None] + noise_th, lop, hip)
        perturbed = pert_pts @ Wt.T
        perturbed = jnp.clip(perturbed, lo_t, hi_t)
        noise_full = perturbed - U2[None]
        pc = noise_full @ a_flat
        rc, _, _ = S.rollout_costs(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), None, None, None, x0,
            perturbed.reshape(K, T, NU), jax.random.PRNGKey(0),
            terminal_final_cost=wterm)
        ct_m = rc + pc
        np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                                   rtol=2e-4, atol=2e-4)

    def test_elites_and_terminal_compose_in_kernel(self):
        """num_elites + terminal_final together in the MPPI kernel: injected
        elite rows get the terminal cost of THEIR final state."""
        E = 2
        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True,
                            num_elites=E)
        wterm = S.wrap_final_cost(self._fterm)
        solve = PR.make_transposed_fused_solve(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            emit_perturbed=True, terminal_final=wterm)
        bits = jax.random.randint(
            jax.random.PRNGKey(3), (D, K), -(2**31), 2**31 - 1, jnp.int32)
        U2 = jax.random.normal(jax.random.PRNGKey(5), (D,), DT) * 0.1
        ones = jnp.ones((D,), DT)
        lam = jnp.asarray(1.0, DT)
        a_flat = U2 * 0.7
        x0 = jnp.array([-3.0, -2.0], DT)
        x0T = jnp.broadcast_to(x0[:, None], (NX, K))
        elites = jax.random.normal(jax.random.PRNGKey(9), (E, T, NU), DT)
        el_op = jnp.zeros((D, 128), DT).at[:, 0:E].set(elites.reshape(E, D).T)
        _, _, _, ct, pert = jax.jit(solve)(
            bits, x0T, U2, 0.8 * ones, 0.0 * ones, -ones, ones, a_flat, lam,
            el_op)

        z = PR._bits_to_normal(bits)
        pert2 = U2[None] + z.T * 0.8
        pert2 = pert2.at[0:E].set(elites.reshape(E, D))
        pert2 = jnp.clip(pert2, -ones, ones)
        noise2 = pert2 - U2[None]
        rc, _, _ = S.rollout_costs(
            config, S.wrap_dynamics(config, lin_dyn),
            S.wrap_cost(config, quad_cost), None, None, None, x0,
            pert2.reshape(K, T, NU), jax.random.PRNGKey(0),
            terminal_final_cost=wterm)
        ct_m = rc + noise2 @ a_flat
        np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_m),
                                   rtol=2e-5, atol=1e-5)
