"""Batch-input decorator contract tests.

Port of ``/root/reference/tests/test_batch_wrapper.py:5-47`` for the native
``handle_batch_input`` replacement (the reference imports it from
arm_pytorch_utilities, mppi.py:7).
"""
import jax.numpy as jnp

from pytorch_mppi_tpu import handle_batch_input


@handle_batch_input(n=2)
def add_2d(a, b):
    assert a.ndim == 2
    assert b.ndim == 2
    return a + b


@handle_batch_input(n=3)
def add_3d(a, b):
    assert a.ndim == 3
    assert b.ndim == 3
    return a + b


def test_batch_wrapper_2d():
    a_2d = jnp.array([[0.1, 0.2, 0.3]])
    b_2d = jnp.array([[0.5, -0.2, 0.3]])
    a_3d = jnp.tile(a_2d, (1, 1, 1))
    b_3d = jnp.tile(b_2d, (1, 1, 1))
    a_4d = jnp.tile(a_3d, (2, 1, 1, 1))
    b_4d = jnp.tile(b_3d, (2, 1, 1, 1))
    expected_sum_2d = jnp.array([[0.6, 0.0, 0.6]])
    expected_sum_3d = jnp.array([[[0.6, 0.0, 0.6]]])
    expected_sum_4d = jnp.array([[[[0.6, 0.0, 0.6]]], [[[0.6, 0.0, 0.6]]]])
    assert jnp.allclose(add_2d(a_2d, b_2d), expected_sum_2d)
    assert jnp.allclose(add_2d(a_3d, b_3d), expected_sum_3d)
    assert jnp.allclose(add_2d(a_4d, b_4d), expected_sum_4d)


def test_batch_wrapper_3d():
    a_3d = jnp.array([[[0.1, 0.2, 0.3]]])
    b_3d = jnp.array([[[0.5, -0.2, 0.3]]])
    a_4d = jnp.tile(a_3d, (2, 1, 1, 1))
    b_4d = jnp.tile(b_3d, (2, 1, 1, 1))
    expected_sum_3d = jnp.array([[[0.6, 0.0, 0.6]]])
    expected_sum_4d = jnp.array([[[[0.6, 0.0, 0.6]]], [[[0.6, 0.0, 0.6]]]])
    assert jnp.allclose(add_3d(a_3d, b_3d), expected_sum_3d)
    assert jnp.allclose(add_3d(a_4d, b_4d), expected_sum_4d)
