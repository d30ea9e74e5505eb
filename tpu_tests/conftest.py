"""TPU test lane configuration.

Unlike ``tests/`` (which forces an 8-device virtual CPU mesh + float64 to
mirror the reference's CPU fixtures), this lane runs on the REAL TPU chip in
float32 — the production configuration.  The reference runs its entire CI
suite on its target device (``/root/reference/.github/workflows/tests.yml``);
this is the equivalent lane for ours: compiled Mosaic kernels, TPU f32
numerics, rbg PRNG, bf16 — everything the CPU lane cannot pin.

Run with:  python -m pytest tpu_tests/ -q      (requires the TPU to be up)
The whole lane auto-skips when no TPU backend is available.
"""
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def tpu_device():
    return jax.devices()[0]
