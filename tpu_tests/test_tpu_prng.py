"""PRNG implementations and reduced precision on the real TPU chip.

The rbg generator (the bench default at large K — ~3x threefry on this chip)
and bf16 sampling have no meaningful CPU test: rbg lowers to the TPU's
hardware RNG path and bf16 is a TPU-native dtype.  This lane pins both.
"""
import numpy as np

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI
from pytorch_mppi_tpu.config import MPPIParams
from pytorch_mppi_tpu.ops import solve as S

DT = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DT)
GOAL = jnp.array([2.0, 2.0], dtype=DT)


def dyn(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def _params(nu=2):
    return MPPIParams(
        noise_mu=jnp.zeros(nu, DT), noise_sigma=jnp.eye(nu, dtype=DT),
        lambda_=jnp.asarray(1.0, DT), u_min=jnp.full((nu,), -jnp.inf, DT),
        u_max=jnp.full((nu,), jnp.inf, DT), u_init=jnp.zeros(nu, DT),
    )


class TestRbg:
    def test_auto_default_picks_rbg_on_tpu(self):
        """The production default (prng_impl='auto') resolves to the TPU
        hardware generator on an unsharded TPU backend, and stays threefry
        with a mesh (the partitionable-bit-identity guarantee)."""
        from jax.sharding import Mesh

        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=16,
                    horizon=4, seed=0)
        assert ctrl.prng_impl == "rbg"
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("k",))
        sharded = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=16,
                       horizon=4, seed=0, mesh=mesh)
        assert sharded.prng_impl is None

    def test_rbg_controller_converges(self):
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=256,
                    horizon=10, lambda_=1.0, seed=42, prng_impl="rbg")
        s = jnp.array([-3.0, -2.0], DT)
        for _ in range(12):
            a = ctrl.command(s)
            s = dyn(s, a)
        assert float(jnp.linalg.norm(GOAL - s)) < 2.0

    def test_rbg_deterministic_same_seed(self):
        def act():
            return MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=128,
                        horizon=6, seed=5, prng_impl="rbg").command(
                jnp.array([1.0, 1.0], DT))

        np.testing.assert_array_equal(np.asarray(act()), np.asarray(act()))

    def test_rbg_normal_moments(self):
        key = jax.random.key(0, impl="rbg")
        z = np.asarray(S.sample_noise_flat(key, 4096, 15, _params(), DT))
        assert abs(z.mean()) < 0.02
        assert abs(z.std() - 1.0) < 0.02


class TestBf16:
    def test_bf16_sampling_finite(self):
        p = MPPIParams(
            noise_mu=jnp.zeros(2, jnp.bfloat16),
            noise_sigma=jnp.eye(2, dtype=jnp.bfloat16),
            lambda_=jnp.asarray(1.0, jnp.bfloat16),
            u_min=jnp.full((2,), -jnp.inf, jnp.bfloat16),
            u_max=jnp.full((2,), jnp.inf, jnp.bfloat16),
            u_init=jnp.zeros(2, jnp.bfloat16),
        )
        z = S.sample_noise_flat(jax.random.PRNGKey(0), 1024, 10, p, jnp.bfloat16)
        assert z.dtype == jnp.bfloat16
        zf = np.asarray(z.astype(jnp.float32))
        assert np.isfinite(zf).all()
        assert abs(zf.std() - 1.0) < 0.05

    def test_bf16_controller_solve(self):
        """A whole solve in bf16 storage (bounds-free, the MXU-native dtype):
        finite and directionally correct.  User fns must produce bf16 (the
        engine propagates the sigma dtype, reference mppi.py:88)."""
        B16 = B.astype(jnp.bfloat16)
        GOAL16 = GOAL.astype(jnp.bfloat16)
        dyn16 = lambda s, a: s + a @ B16.T
        cost16 = lambda s, a: ((GOAL16 - s) ** 2).sum(axis=-1)
        ctrl = MPPI(dyn16, cost16, 2, jnp.eye(2, dtype=jnp.bfloat16),
                    num_samples=256, horizon=8, lambda_=1.0, seed=0)
        s = jnp.array([-3.0, -2.0], jnp.bfloat16)
        a = ctrl.command(s)
        assert a.dtype == jnp.bfloat16
        af = np.asarray(a.astype(jnp.float32))
        assert np.isfinite(af).all()
        # the first action must push toward the goal (positive x, negative-y
        # control since B flips the second axis)
        assert af[0] > 0

    def test_antithetic_on_chip(self):
        z = S.sample_noise_flat(jax.random.PRNGKey(1), 256, 10, _params(), DT,
                                antithetic=True)
        z = np.asarray(z)
        np.testing.assert_allclose(z[:128], -z[128:], rtol=0, atol=0)

    def test_threefry_matches_cpu(self):
        """Cross-backend draw agreement: the threefry BITS are bit-identical
        (backend-independent, partitionable); the uniform->normal map
        (erf_inv) differs between backends by ~2e-5, so the noise agrees to
        that tolerance — and the diag fast path adds NO further error (the
        kron matmul it replaces runs at bf16 input precision on TPU, ~4e-3)."""
        key = jax.random.PRNGKey(123)
        bits_tpu = np.asarray(jax.random.bits(key, (64,), jnp.uint32))
        z_tpu = np.asarray(
            S.sample_noise_flat(key, 64, 5, _params(), DT, diag_sigma=True))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            bits_cpu = np.asarray(jax.random.bits(key, (64,), jnp.uint32))
            z_cpu = np.asarray(
                S.sample_noise_flat(key, 64, 5, _params(), DT, diag_sigma=True))
        np.testing.assert_array_equal(bits_tpu, bits_cpu)
        np.testing.assert_allclose(z_tpu, z_cpu, rtol=0, atol=2e-4)

    def test_diag_fast_path_matches_matmul_path(self):
        """The diag elementwise path draws the same noise as the kron-matmul
        path to TPU matmul precision (identical bitwise on CPU — pinned by
        the CPU lane's equivalence tests)."""
        key = jax.random.PRNGKey(9)
        p = _params()
        z_diag = np.asarray(S.sample_noise_flat(key, 128, 6, p, DT,
                                                diag_sigma=True))
        z_mat = np.asarray(S.sample_noise_flat(key, 128, 6, p, DT,
                                               diag_sigma=False))
        np.testing.assert_allclose(z_diag, z_mat, rtol=0, atol=2e-2)
