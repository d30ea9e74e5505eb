"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); these validate the
net-new TPU scaling layer: sharded solves must be *bit-identical* to single-device
solves (partitionable threefry + deterministic XLA reductions), and the pod-scale
scenario-batch config must compile and run on a 2-D mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI, MPPI_Batched
from pytorch_mppi_tpu.parallel import make_mesh

DTYPE = jnp.float64
SEED = 42

B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DTYPE)
GOAL = jnp.array([2.0, 2.0], dtype=DTYPE)


def linear_dynamics(state, action):
    return state + action @ B.T


def quadratic_cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@needs_8_devices
class TestShardedMPPI:
    def test_k_sharded_matches_single_device(self):
        """Sharding K over 8 devices must not change the result at all."""
        state = jnp.array([-3.0, -2.0], dtype=DTYPE)
        mesh = make_mesh((8,), ("k",))

        ctrl_ref = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                        num_samples=512, horizon=10, lambda_=1.0, seed=SEED)
        ctrl_sh = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                       num_samples=512, horizon=10, lambda_=1.0, seed=SEED,
                       mesh=mesh)
        for _ in range(3):
            a_ref = ctrl_ref.command(state)
            a_sh = ctrl_sh.command(state)
            np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ctrl_ref.cost_total), np.asarray(ctrl_sh.cost_total), rtol=1e-9
        )

    def test_k_sharded_closed_loop(self):
        mesh = make_mesh((8,), ("k",))
        ctrl = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                    num_samples=512, horizon=15, lambda_=1.0, seed=SEED, mesh=mesh)
        state = jnp.array([-3.0, -2.0], dtype=DTYPE)
        for _ in range(20):
            a = ctrl.command(state)
            state = linear_dynamics(state[None], a[None])[0]
        assert float(jnp.linalg.norm(state - GOAL)) < 2.0


@needs_8_devices
class TestShardedBatched:
    def test_env_sharded_matches_single_device(self):
        """N plants sharded over 'data' must match the unsharded batched solve."""
        mesh = make_mesh((8,), ("data",))
        states = jnp.asarray(np.random.RandomState(SEED).randn(16, 2), dtype=DTYPE)

        kw = dict(num_envs=16, num_samples=128, horizon=10, lambda_=1.0, seed=SEED)
        ctrl_ref = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                                jnp.eye(2, dtype=DTYPE), **kw)
        ctrl_sh = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                               jnp.eye(2, dtype=DTYPE), mesh=mesh, **kw)
        for _ in range(3):
            a_ref = ctrl_ref.command(states)
            a_sh = ctrl_sh.command(states)
            np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh), rtol=1e-12)

    def test_2d_mesh_env_and_sample_sharded(self):
        """Pod-scale shape: plants over 'data', samples over 'k' (SURVEY.md §2.4)."""
        mesh = make_mesh((2, 4), ("data", "k"))
        states = jnp.asarray(np.random.RandomState(SEED).randn(8, 2), dtype=DTYPE)

        kw = dict(num_envs=8, num_samples=64, horizon=10, lambda_=1.0, seed=SEED)
        ctrl_ref = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                                jnp.eye(2, dtype=DTYPE), **kw)
        ctrl_sh = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                               jnp.eye(2, dtype=DTYPE), mesh=mesh,
                               env_axis="data", sample_axis="k", **kw)
        a_ref = ctrl_ref.command(states)
        a_sh = ctrl_sh.command(states)
        np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh), rtol=1e-12)

    def test_sharded_progress_toward_goal(self):
        mesh = make_mesh((4, 2), ("data", "k"))
        N = 8
        ctrl = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                            jnp.eye(2, dtype=DTYPE), num_envs=N, num_samples=256,
                            horizon=10, lambda_=1.0, seed=SEED, mesh=mesh,
                            env_axis="data", sample_axis="k")
        states = jnp.asarray(np.random.RandomState(SEED).randn(N, 2) * 3, dtype=DTYPE)
        initial = jnp.linalg.norm(states - GOAL, axis=-1)
        for _ in range(10):
            actions = ctrl.command(states)
            states = linear_dynamics(states, actions)
        final = jnp.linalg.norm(states - GOAL, axis=-1)
        assert float(jnp.mean(final)) < float(jnp.mean(initial))


@needs_8_devices
class TestDeterminismAcrossMeshShapes:
    def test_same_result_on_different_mesh_shapes(self):
        """Mesh layout must not leak into numerics (race-detector analog,
        SURVEY.md §5.2)."""
        state = jnp.array([1.0, -1.0], dtype=DTYPE)
        actions = []
        for shape, names in [((8,), ("k",)), ((4,), ("k",)), (None, None)]:
            if shape is None:
                mesh = None
            else:
                mesh = make_mesh(shape, names, devices=jax.devices()[: shape[0]])
            ctrl = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                        num_samples=256, horizon=10, lambda_=1.0, seed=SEED, mesh=mesh)
            actions.append(np.asarray(ctrl.command(state)))
        np.testing.assert_allclose(actions[0], actions[1], rtol=1e-12)
        np.testing.assert_allclose(actions[0], actions[2], rtol=1e-12)


def test_antithetic_sharded_matches_single_device():
    """Antithetic sampling composes with K-sharding.  The mirrored concat
    changes data placement and therefore the reduction tree, so agreement is
    to float tolerance (unlike the plain path's bit-identity) — still
    deterministic per configuration."""
    import jax
    from jax.sharding import Mesh

    from pytorch_mppi_tpu import MPPI

    kw = dict(num_samples=64, horizon=6, lambda_=1.0, seed=11,
              antithetic_sampling=True)
    c_ref = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE), **kw)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("k",))
    c_sh = MPPI(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                mesh=mesh, sample_axis="k", **kw)
    state = jnp.array([-2.0, 1.0], DTYPE)
    for _ in range(3):
        a1 = c_ref.command(state)
        a2 = c_sh.command(state)
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=1e-12, atol=1e-13
        )
