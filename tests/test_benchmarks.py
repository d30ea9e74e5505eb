"""Smoke coverage for the benchmark scripts that gate design decisions.

`benchmarks/batched_modes.py` is the measurement the `use_pallas` batched
routing decision rests on (docs/DESIGN.md §6) — a broken harness would pin
the decision to garbage, so its plumbing gets line coverage here (tiny
shapes; the CPU lane runs the xla and fused-operand modes, fused-rng
self-skips without a TPU).
"""
import pathlib
import sys

import pytest

BENCHMARKS = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


@pytest.fixture(autouse=True)
def _benchmarks_on_path():
    sys.path.insert(0, str(BENCHMARKS))
    yield
    sys.path.remove(str(BENCHMARKS))


class TestBatchedModes:
    def test_cpu_lane_measures_xla_and_operand(self):
        import batched_modes

        results = batched_modes.main(
            ["--plants", "4", "--samples", "256", "--horizon", "6",
             "--steps", "5"]
        )
        assert results["N"] == 4 and results["K"] == 256
        # both CPU-runnable modes measured, positive per-step times
        assert results["xla"] > 0
        assert results["fused-operand"] > 0
        # fused-rng needs the TPU hardware PRNG: skipped on CPU
        import jax

        if jax.default_backend() != "tpu":
            assert "fused-rng" not in results


class TestTerminalModes:
    def test_cpu_lane_measures_all_variants(self):
        """benchmarks/terminal_modes.py gates the DESIGN §12 cost claims —
        its plumbing gets line coverage at tiny shapes (the pallas variant
        falls back to XLA on CPU, which is fine: the harness must not
        crash)."""
        import terminal_modes

        out = terminal_modes.run(K=128, T=6, solves=5, repeats=1)
        assert set(out) == {"none", "full_hook", "final_hook", "final_pallas"}
        assert all(v > 0 for v in out.values())


class TestEliteModes:
    def test_cpu_lane_measures_both_paths(self):
        """benchmarks/elite_modes.py gates the DESIGN §11 cost claims."""
        import elite_modes

        out = elite_modes.run(ks=(128,), T=6, solves=5, repeats=1)
        assert set(out) == {"K128_xla_e0", "K128_xla_e4",
                            "K128_pallas_fa_e0", "K128_pallas_fa_e4"}
        assert all(v > 0 for v in out.values())
