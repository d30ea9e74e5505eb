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
    """The identical math in plain jnp, batch-first."""
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
        perturbed2.reshape(K, T, NU) * 1.0, jax.random.PRNGKey(0),
    )
    ct = rc + pert_cost
    logits = -ct / lam
    m = jnp.max(logits)
    w = jnp.exp(logits - m)
    s_ = jnp.sum(w)
    delta = (w / s_) @ noise2
    return ct, m, s_, delta


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
    ct_m, m_m, s_m, delta_m = _mirror(
        config, dyn, cost, bits, x0, U2, scale_t, mu_t, lo_t, hi_t, a_flat,
        lam,
    )
    np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_m),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(m_k), float(m_m), rtol=1e-6)
    np.testing.assert_allclose(float(s_k), float(s_m), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(delta_k) / float(s_k),
                               np.asarray(delta_m), rtol=2e-4, atol=2e-6)


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

    def test_unsupported_dynamics_raises(self):
        def bad_dyn(s, a):
            return s - s.mean(axis=0, keepdims=True) + a

        config = MPPIConfig(nx=NX, nu=NU, K=K, T=T, dtype=DT, diag_sigma=True)
        with pytest.raises(UnsupportedPrimitive):
            PR.make_transposed_fused_solve(
                config, S.wrap_dynamics(config, bad_dyn),
                S.wrap_cost(config, quad_cost), rng_in_kernel=False,
            )

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
