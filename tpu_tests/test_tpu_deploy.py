"""AOT deployment artifacts on the real TPU chip.

The CPU lane (tests/test_deploy.py) pins the round-trip semantics; this lane
pins the production path: export a TPU-lowered artifact, reload it, and run
the served solve on the chip, matching the live controller.  Also pins the
adaptive-covariance extension compiling and solving on real hardware.
"""
import numpy as np

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI
from pytorch_mppi_tpu.utils import deploy

DT = jnp.float32
B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DT)
GOAL = jnp.array([2.0, 2.0], dtype=DT)


def dyn(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


START = jnp.array([-3.0, -2.0], dtype=DT)


class TestDeployOnChip:
    def test_tpu_artifact_roundtrip_matches_live(self, tmp_path):
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=128,
                    horizon=8, lambda_=1.0, seed=3)
        path = str(tmp_path / "solver.npz")
        deploy.export_solver(ctrl, path, platforms=("tpu",))
        solver = deploy.load_solver(path)
        assert solver.platforms == ("tpu",)
        s = START
        for _ in range(3):
            a_live = np.asarray(ctrl.command(s))
            a_served = np.asarray(solver.command(s))
            np.testing.assert_array_equal(a_live, a_served)
            s = dyn(s, jnp.asarray(a_live, DT))

    def test_multi_platform_artifact_runs_on_tpu(self, tmp_path):
        ctrl = MPPI(dyn, cost, 2, jnp.eye(2, dtype=DT), num_samples=64,
                    horizon=6, seed=5)
        path = str(tmp_path / "multi.npz")
        deploy.export_solver(ctrl, path, platforms=("cpu", "tpu"))
        solver = deploy.load_solver(path)
        a = solver.command(START)
        assert jnp.isfinite(jnp.asarray(a)).all()
        assert solver.omega.shape == (64,)


class TestAdaptiveCovarianceOnChip:
    def test_adaptive_solve_compiles_and_improves_plan(self):
        """The MPOPI-style adaptation loop (rank-mu einsum + blend threaded
        through the iteration unroll) must compile and beat the fixed-sigma
        plan on the chip at a mis-scaled sigma (CPU lane pins 2x; relaxed to
        1.5x here for f32-on-chip noise)."""
        kw = dict(num_samples=256, horizon=10, lambda_=1.0, seed=11,
                  num_iterations=5, u_max=jnp.array([0.6, 0.6], DT))
        sigma = 25.0 * jnp.eye(2, dtype=DT)

        def best_plan(**extra):
            c = MPPI(dyn, cost, 2, sigma, **kw, **extra)
            s = START
            for _ in range(10):
                a = c.command(s)
                s = dyn(s, a)
            return float(jnp.min(c.cost_total))

        fixed = best_plan()
        adapt = best_plan(adaptive_covariance=True, adaptive_cov_lr=0.8)
        assert np.isfinite(adapt)
        assert adapt < fixed / 1.5, (adapt, fixed)
