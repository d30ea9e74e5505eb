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
