"""AOT deployment artifacts (utils.deploy): the controller's compiled solve
serialized via jax.export + params/state in one self-describing file.

Net-new vs the reference, which has no AOT/serving story at all — deploying
it means shipping the Python class plus the user's dynamics/cost callables
to every host.  Here the serving host needs NO user code: the fresh-process
test below loads and drives the artifact from an interpreter that never
defines the dynamics.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_mppi_tpu import KMPPI, MPPI, MPPI_Batched, SMPPI
from pytorch_mppi_tpu.utils import deploy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DTYPE = jnp.float32  # fresh-process child runs without x64
SEED = 7

B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DTYPE)
GOAL = jnp.array([2.0, 2.0], dtype=DTYPE)


def linear_dynamics(state, action):
    return state + action @ B.T


def quadratic_cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def _mk(cls=MPPI, **kw):
    return cls(linear_dynamics, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
               num_samples=64, horizon=8, lambda_=1.0, seed=SEED,
               u_max=jnp.array([0.8, 0.8], dtype=DTYPE), **kw)


def _drive(obj, steps=3):
    s = jnp.array([-3.0, -2.0], dtype=DTYPE)
    acts = []
    for _ in range(steps):
        a = obj.command(s)
        acts.append(np.asarray(a))
        s = linear_dynamics(s, jnp.asarray(a, DTYPE))
    return acts


class TestExportRoundtrip:
    def test_mppi_bit_matches_live_controller(self, tmp_path):
        """The exported StableHLO is the SAME traced program: a loaded
        artifact must reproduce the live controller's closed loop
        bit-for-bit from the captured state."""
        ctrl = _mk()
        path = str(tmp_path / "solver.npz")
        deploy.export_solver(ctrl, path)
        solver = deploy.load_solver(path)
        live = _drive(ctrl)
        served = _drive(solver)
        for a, b in zip(live, served):
            np.testing.assert_array_equal(a, b)
        # artifact surface mirrors the controller's
        assert solver.cost_total is not None
        assert solver.omega.shape == (64,)

    def test_no_shift_entry_point(self, tmp_path):
        ctrl = _mk()
        solver = deploy.export_solver(ctrl, str(tmp_path / "s.npz"))
        a1 = ctrl.command(jnp.zeros(2, DTYPE), shift_nominal_trajectory=False)
        a2 = solver.command(jnp.zeros(2, DTYPE), shift_nominal_trajectory=False)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_smppi_kmppi_roundtrip(self, tmp_path):
        for name, ctrl in (
            ("smppi", _mk(SMPPI, w_action_seq_cost=0.1, delta_t=1.0)),
            ("kmppi", _mk(KMPPI, num_support_pts=4)),
        ):
            path = str(tmp_path / f"{name}.npz")
            deploy.export_solver(ctrl, path)
            solver = deploy.load_solver(path)
            for a, b in zip(_drive(ctrl), _drive(solver)):
                np.testing.assert_array_equal(a, b)

    def test_batched_roundtrip(self, tmp_path):
        ctrl = MPPI_Batched(linear_dynamics, quadratic_cost, 2,
                            jnp.eye(2, dtype=DTYPE), num_envs=3,
                            num_samples=32, horizon=6, seed=SEED)
        path = str(tmp_path / "batched.npz")
        deploy.export_solver(ctrl, path)
        solver = deploy.load_solver(path)
        x0 = jnp.stack([jnp.array([-3.0, -2.0], DTYPE),
                        jnp.array([3.0, 2.0], DTYPE),
                        jnp.zeros(2, DTYPE)])
        for _ in range(2):
            a = ctrl.command(x0)
            b = solver.command(x0)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dynamics_params_stay_runtime_inputs(self, tmp_path):
        """Learned-model weights are traced operands of the exported program:
        the serving host can swap them (e.g. after retraining) without
        re-exporting."""
        def param_dyn(params, state, action):
            return state + action @ params["B"].T

        ctrl = MPPI(param_dyn, quadratic_cost, 2, jnp.eye(2, dtype=DTYPE),
                    num_samples=32, horizon=6, seed=SEED,
                    dynamics_params={"B": B})
        solver = deploy.export_solver(ctrl, str(tmp_path / "p.npz"))
        solver2 = deploy.load_solver(str(tmp_path / "p.npz"))
        solver2.command(jnp.array([-3.0, -2.0], DTYPE))
        c_orig = np.asarray(solver2.cost_total)
        solver2.dyn_params = {"B": 2.0 * B}
        solver2.state = solver.state  # rewind to compare at equal state
        solver2.command(jnp.array([-3.0, -2.0], DTYPE))
        c_new = np.asarray(solver2.cost_total)
        # the rollout costs see the swapped weights (the actions may
        # coincide: near-one-hot omega picks the same argmin sample)
        assert not np.array_equal(c_orig, c_new)

    def test_params_swappable_after_load(self, tmp_path):
        """Tunable hyperparameters are runtime inputs: a tuner's result can
        be applied to a loaded artifact."""
        ctrl = _mk()
        deploy.export_solver(ctrl, str(tmp_path / "s.npz"))
        solver = deploy.load_solver(str(tmp_path / "s.npz"))
        s0 = solver.state
        a1 = solver.command(jnp.array([-3.0, -2.0], DTYPE))
        solver.state = s0
        solver.params = solver.params._replace(
            lambda_=jnp.asarray(100.0, DTYPE))
        a2 = solver.command(jnp.array([-3.0, -2.0], DTYPE))
        assert not np.array_equal(np.asarray(a1), np.asarray(a2))

    def test_live_info_rejected(self, tmp_path):
        ctrl = _mk()
        ctrl.command(jnp.zeros(2, DTYPE), info={"x": jnp.zeros(1, DTYPE)})
        with pytest.raises(ValueError, match="info"):
            deploy.export_solver(ctrl, str(tmp_path / "s.npz"))

    def test_version_guard(self, tmp_path):
        from pytorch_mppi_tpu.utils import checkpoint as ckpt

        ctrl = _mk()
        path = str(tmp_path / "s.npz")
        deploy.export_solver(ctrl, path)
        tree = ckpt.load(path)
        import json

        meta = json.loads(tree["meta"])
        meta["version"] = 999
        tree["meta"] = json.dumps(meta)
        ckpt.save(path, tree)
        with pytest.raises(ValueError, match="version"):
            deploy.load_solver(path)


class TestFreshProcess:
    def test_serving_host_needs_no_user_code(self, tmp_path):
        """The gold serving contract: a fresh interpreter that NEVER imports
        or defines the dynamics/cost loads the artifact and produces the
        live controller's exact actions."""
        ctrl = _mk()
        path = str(tmp_path / "solver.npz")
        deploy.export_solver(ctrl, path)
        expected = np.stack(_drive(ctrl, steps=2))

        child = (
            "import numpy as np, jax.numpy as jnp\n"
            "from pytorch_mppi_tpu.utils import deploy\n"
            f"solver = deploy.load_solver({path!r})\n"
            "s = jnp.array([-3.0, -2.0], jnp.float32)\n"
            "acts = []\n"
            "for _ in range(2):\n"
            "    a = solver.command(s)\n"
            "    acts.append(np.asarray(a))\n"
            "    s = s + jnp.asarray(a, jnp.float32) @ "
            "jnp.array([[1.,0.],[0.,-1.]], jnp.float32).T\n"
            "np.save(" + repr(str(tmp_path / "acts.npy")) + ", np.stack(acts))\n"
            "print('SERVED OK')\n"
        )
        env = {k: v for k, v in os.environ.items()
               if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", child], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0 and "SERVED OK" in out.stdout, (
            out.stdout[-2000:] + out.stderr[-2000:]
        )
        got = np.load(str(tmp_path / "acts.npy"))
        np.testing.assert_array_equal(got, expected)


class TestRound5FeatureExport:
    def test_elites_and_terminal_final_round_trip(self, tmp_path):
        """The AOT artifact carries the round-5 state/feature surface:
        MPPIState.elites rides the exported state structure, the compiled
        solve bakes the final-state terminal cost in, and the served solver
        replays the build-host controller bit-exactly."""
        fterm = lambda s, a: 3.0 * (s ** 2).sum(axis=-1)
        ctrl = MPPI(linear_dynamics, quadratic_cost, 2,
                    0.5 * jnp.eye(2, dtype=jnp.float32), num_samples=32,
                    horizon=6, seed=3, num_elites=2,
                    terminal_final_cost=fterm,
                    u_min=-jnp.ones(2, jnp.float32),
                    u_max=jnp.ones(2, jnp.float32))
        path = str(tmp_path / "solver.mppi.npz")
        deploy.export_solver(ctrl, path)
        srv = deploy.load_solver(path)
        x = jnp.array([-2.0, 1.0], jnp.float32)
        for _ in range(3):
            a_live = ctrl.command(x)
            a_srv = srv.command(x)
            np.testing.assert_array_equal(np.asarray(a_live),
                                          np.asarray(a_srv))
            x = linear_dynamics(x, a_live)
        assert srv.state.elites is not None
