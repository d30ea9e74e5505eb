"""Tests for auxiliary subsystems: timing, tracing, checkpoint/resume
(SURVEY.md §5 — the reference has none of these in-library)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_mppi_tpu import MPPI, KMPPI, SMPPI
from pytorch_mppi_tpu.utils import checkpoint
from pytorch_mppi_tpu.utils.timer import benchmark_command, benchmark_fn

DTYPE = jnp.float64
SEED = 42

B = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=DTYPE)
GOAL = jnp.array([2.0, 2.0], dtype=DTYPE)


def dyn(state, action):
    return state + action @ B.T


def cost(state, action):
    return ((GOAL - state) ** 2).sum(axis=-1)


def _ctrl(cls=MPPI, **kw):
    base = dict(num_samples=64, horizon=8, lambda_=1.0, seed=SEED)
    base.update(kw)
    return cls(dyn, cost, 2, jnp.eye(2, dtype=DTYPE), **base)


class TestTimer:
    def test_benchmark_command(self):
        ctrl = _ctrl()
        state = jnp.array([0.0, 0.0], DTYPE)
        stats = benchmark_command(ctrl, state, num_warmup=1, num_iters=5)
        assert stats["mean_s"] > 0
        assert stats["min_s"] <= stats["median_s"] <= stats["max_s"]

    def test_benchmark_fn(self):
        f = lambda x: x * 2
        stats = benchmark_fn(f, jnp.ones(4), num_warmup=1, num_iters=3)
        assert stats["median_s"] > 0


class TestCheckpoint:
    def test_snapshot_restore_roundtrip(self):
        ctrl = _ctrl()
        state = jnp.array([-1.0, 1.0], DTYPE)
        ctrl.command(state)
        snap = checkpoint.snapshot(ctrl)
        a_expected = ctrl.command(state)

        checkpoint.restore(ctrl, snap)
        a_again = ctrl.command(state)
        np.testing.assert_array_equal(np.asarray(a_expected), np.asarray(a_again))

    def test_save_load_controller(self, tmp_path):
        ctrl = _ctrl()
        state = jnp.array([-1.0, 1.0], DTYPE)
        ctrl.command(state)
        path = os.path.join(tmp_path, "ctrl.npz")
        checkpoint.save_controller(path, ctrl)
        a_expected = ctrl.command(state)

        # resume in a freshly built controller (different seed -> different state)
        ctrl2 = _ctrl(seed=999)
        checkpoint.load_controller(path, ctrl2)
        a_resumed = ctrl2.command(state)
        np.testing.assert_array_equal(np.asarray(a_expected), np.asarray(a_resumed))

    def test_save_load_smppi_kmppi(self, tmp_path):
        for cls in (SMPPI, KMPPI):
            ctrl = _ctrl(cls)
            state = jnp.array([0.5, -0.5], DTYPE)
            ctrl.command(state)
            path = os.path.join(tmp_path, f"{cls.__name__}.npz")
            checkpoint.save_controller(path, ctrl)
            a_expected = ctrl.command(state)
            ctrl2 = _ctrl(cls, seed=7)
            checkpoint.load_controller(path, ctrl2)
            a_resumed = ctrl2.command(state)
            np.testing.assert_array_equal(np.asarray(a_expected), np.asarray(a_resumed))

    def test_save_load_pytree(self, tmp_path):
        tree = {"a": jnp.arange(3.0), "b": (jnp.eye(2), jnp.asarray(1.5))}
        path = os.path.join(tmp_path, "tree.npz")
        checkpoint.save(path, tree)
        loaded = checkpoint.load(path, like=tree)
        np.testing.assert_allclose(np.asarray(loaded["a"]), [0, 1, 2])
        np.testing.assert_allclose(np.asarray(loaded["b"][0]), np.eye(2))


class TestPallasPath:
    """use_pallas correctness on CPU (interpreter mode) vs the scan path."""

    def test_pallas_matches_scan_f32(self):
        B32 = B.astype(jnp.float32)
        GOAL32 = GOAL.astype(jnp.float32)
        dyn32 = lambda s, a: s + a @ B32.T
        cost32 = lambda s, a: ((GOAL32 - s) ** 2).sum(axis=-1)
        eye = jnp.eye(2, dtype=jnp.float32)
        kw = dict(num_samples=256, horizon=8, lambda_=1.0, seed=3)
        c_ref = MPPI(dyn32, cost32, 2, eye, **kw)
        c_pal = MPPI(dyn32, cost32, 2, eye, use_pallas=True, **kw)
        state = jnp.array([-3.0, -2.0], jnp.float32)
        for _ in range(3):
            a1 = c_ref.command(state)
            a2 = c_pal.command(state)
            np.testing.assert_allclose(
                np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(c_ref.omega), np.asarray(c_pal.omega), rtol=1e-4, atol=1e-7
        )

    def test_pallas_falls_back_when_ineligible(self):
        """f64 / terminal cost configs silently use the scan path."""
        term = lambda states, actions: ((GOAL - states[..., -1, :]) ** 2).sum(axis=-1)
        ctrl = _ctrl(use_pallas=True, terminal_state_cost=term)
        a = ctrl.command(jnp.array([0.0, 0.0], DTYPE))
        assert a.shape == (2,)
        assert ctrl.states is not None  # storage intact -> scan path ran
