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


def test_controller_adapts_user_fn_batch_rank():
    """The engine's dynamics/cost wrappers adapt the (state, action) pair just
    like the reference applies handle_batch_input(n=2) to _dynamics and
    _running_cost (mppi.py:221-227): user fns written strictly for 2-D batches
    accept any extra leading batch dims through wrap_dynamics/wrap_cost."""
    from pytorch_mppi_tpu.config import MPPIConfig
    from pytorch_mppi_tpu.ops.solve import wrap_cost, wrap_dynamics

    def strict_2d_dynamics(s, u):
        assert s.ndim == 2 and u.ndim == 2
        return s + jnp.pad(u, ((0, 0), (0, 1)))

    def strict_2d_cost(s, u):
        assert s.ndim == 2 and u.ndim == 2
        return (s**2).sum(axis=-1)

    config = MPPIConfig(nx=3, nu=2, K=4, T=5)
    dyn = wrap_dynamics(config, strict_2d_dynamics)
    cost = wrap_cost(config, strict_2d_cost)

    s2 = jnp.ones((6, 3))
    u2 = jnp.ones((6, 2))
    s4 = s2.reshape(2, 3, 1, 3) * 2.0
    u4 = u2.reshape(2, 3, 1, 2)
    out2 = dyn(None, s2, u2, 0, None)
    assert out2.shape == (6, 3)
    out4 = dyn(None, s4, u4, 0, None)
    assert out4.shape == (2, 3, 1, 3)
    assert jnp.allclose(out4.reshape(6, 3), dyn(None, s4.reshape(6, 3), u4.reshape(6, 2), 0, None))
    c4 = cost(s4, u4, 0)
    assert c4.shape == (2, 3, 1)
    assert jnp.allclose(c4.reshape(-1), cost(s4.reshape(6, 3), u4.reshape(6, 2), 0))
