"""Batch-dimension handling utilities.

Native replacement for ``arm_pytorch_utilities.handle_batch_input`` (consumed by the
reference at ``mppi.py:7,221-227``; behavior contract pinned by
``/root/reference/tests/test_batch_wrapper.py:5-47``): a function written for
n-dimensional inputs transparently accepts inputs with extra leading batch
dimensions — they are flattened before the call and restored on every array output.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _is_array(x):
    return isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "ndim")


def handle_batch_input(n: int = 2):
    """Decorator: flatten >n leading batch dims before calling, restore after.

    Under jit all shapes are static, so the flatten/restore is free at runtime —
    it only shapes the traced program.
    """

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            batch_dims = None
            for arg in args:
                if _is_array(arg) and arg.ndim > n:
                    batch_dims = arg.shape[: -(n - 1)] if n > 1 else arg.shape
                    break
            if batch_dims is None:
                return func(*args, **kwargs)

            def flatten(a):
                if _is_array(a) and a.ndim > n:
                    return a.reshape(-1, *a.shape[-(n - 1):]) if n > 1 else a.reshape(-1)
                return a

            flat_args = [flatten(a) for a in args]
            ret = func(*flat_args, **kwargs)

            def restore(r):
                if _is_array(r):
                    return r.reshape(*batch_dims, *r.shape[1:])
                return r

            if isinstance(ret, tuple):
                return tuple(restore(r) for r in ret)
            return restore(ret)

        return wrapper

    return decorator


def ensure_tensor(device, dtype, *values):
    """Native replacement for ``arm_pytorch_utilities.tensor_utils.ensure_tensor``
    (reference autotune.py:8,154,184): coerce values to jnp arrays of dtype."""
    coerced = tuple(jnp.asarray(v, dtype) for v in values)
    return coerced[0] if len(coerced) == 1 else coerced


def batch_quadratic_product(x, A):
    """x^T A x along the last dim for a batch of vectors — native replacement for
    ``arm_pytorch_utilities.linalg.batch_quadratic_product``
    (used by reference example envs, tests/smooth_mppi.py:59,74)."""
    return jnp.einsum("...i,ij,...j->...", x, A, x)
