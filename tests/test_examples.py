"""Example-driver smoke tests: the runnable scripts under ``examples/`` must
not rot (import, run at tiny shapes, hit their own success criteria).

The reference keeps its examples un-tested (CI runs only the pure suites,
``/root/reference/.github/workflows/tests.yml:23-29``) — here the
parameterizable dependency-free drivers (``scenario_batch``,
``auto_tune_parameters --fast``) are smoke-run on the CPU backend at reduced
shapes; ``fused_kernel_demo`` needs a TPU to be meaningful (its code path —
MLP dynamics through the fused kernel — is pinned on-chip by
``tpu_tests/test_tpu_pallas.py``) and the gym/matplotlib-gated pendulum
drivers are exercised by their library-level counterparts in
``tests/test_models.py``.
"""
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.fixture(autouse=True)
def _examples_on_path():
    sys.path.insert(0, str(EXAMPLES))
    yield
    sys.path.remove(str(EXAMPLES))


class TestScenarioBatch:
    def test_tiny_run_converges(self):
        import scenario_batch

        converged, N = scenario_batch.main(
            ["--plants", "8", "--samples", "128", "--horizon", "8",
             "--steps", "30"]
        )
        # K=128 is far noisier than the example's default 256: the smoke gate
        # is most-plants-converge, the example's own assert holds the 90% bar
        assert converged >= 0.75 * N

    def test_meshed_run_matches_unmeshed(self, capsys):
        """The 'data'-mesh run must produce the SAME convergence count as the
        unmeshed run (bit-identical sharding: plants are independent and the
        noise stream is layout-invariant)."""
        import scenario_batch

        args = ["--plants", "8", "--samples", "128", "--horizon", "8",
                "--steps", "20"]
        c0, _ = scenario_batch.main(args)
        c1, _ = scenario_batch.main(args + ["--mesh"])
        assert c0 == c1

    def test_jit_loop_matches_eager(self):
        """--jit-loop (one run_mppi_jit dispatch for the whole scenario) must
        reach the same convergence count as the eager per-step loop — the
        same solver bundle and key stream drive both."""
        import scenario_batch

        args = ["--plants", "8", "--samples", "128", "--horizon", "8",
                "--steps", "20"]
        c0, _ = scenario_batch.main(args)
        c1, _ = scenario_batch.main(args + ["--jit-loop"])
        assert c0 == c1


class TestAutoTuneExample:
    def test_fast_run_all_five_sections(self, capsys):
        """All five tuning sections (CMA-ES, Sobol, QD, population-parallel,
        gradient) run end-to-end at reduced shapes (~2 min CPU)."""
        import auto_tune_parameters

        auto_tune_parameters.main(fast=True)
        out = capsys.readouterr().out
        assert "CMA-ES best cost" in out
        assert "Global search best cost" in out
        assert "QD archive size" in out
        assert "Population-parallel global search best cost" in out
        assert "Gradient (through-the-solve) best cost" in out


class TestDifferentiableMPCExample:
    def test_training_through_control_improves(self):
        import differentiable_mpc

        l0, l1 = differentiable_mpc.main(train_steps=15)
        assert l1 < 0.6 * l0


class TestDeployServing:
    def test_build_then_serve_in_fresh_process(self):
        """The deploy example's full story at tiny shapes: export on the
        'build host', close the loop on a 'serving host' subprocess that
        never defines the dynamics."""
        import deploy_serving

        r = deploy_serving.main(["--steps", "8", "--samples", "64"])
        import numpy as np

        assert r["steps"] == 8 and np.isfinite(r["final_angle"])


class TestGradientRefinementExample:
    def test_starved_k_rescued(self):
        """The A/B at tiny shapes: the refined starved-K controller must beat
        the unrefined one on accumulated cost (the full 150-step swing-up
        claim is the example's own __main__ assert)."""
        import gradient_refinement

        rows = gradient_refinement.main(
            ["--samples", "5", "--steps", "60", "--seeds", "2"]
        )
        (_, _, cost_base), (_, angle_ref, cost_ref) = rows
        assert cost_ref < cost_base
        import numpy as np

        assert np.isfinite(angle_ref)


class TestEliteReuseExample:
    def test_starved_k_improves(self):
        """The A/B at reduced shapes: the elite-reuse controller must beat
        the baseline on accumulated cost (the full 100-step claim is the
        example's own __main__ assert)."""
        import elite_reuse

        rows = elite_reuse.main(
            ["--samples", "16", "--elites", "4", "--steps", "60",
             "--seeds", "2"]
        )
        (_, cost_base, _), (_, cost_el, _) = rows
        assert cost_el < cost_base
