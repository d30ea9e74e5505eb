"""Trajectory-time kernels and precomputed interpolation operators for KMPPI.

Reference: ``/root/reference/src/pytorch_mppi/mppi.py:573-591`` (TimeKernel/RBFKernel)
and ``mppi.py:621-655`` (kernel interpolation).  The reference performs a batched
``linalg.solve(Ktktk, K)`` per call under ``torch.vmap``; on TPU both matrices are
constants for a fixed horizon, so we precompute the full interpolation operator once
and deparameterization becomes a single MXU matmul.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class TimeKernel:
    """Kernel acting on the time dimension of trajectories (mppi.py:573-577).

    ``__call__(t, tk)`` takes (n, d) and (m, d) time coordinates and returns the
    (n, m) Gram matrix.
    """

    def __call__(self, t, tk):
        raise NotImplementedError


class RBFKernel(TimeKernel):
    """exp(-sum (t - tk)^2 / (1e-8 + 2 sigma^2))  (mppi.py:580-590)."""

    def __init__(self, sigma=1):
        self.sigma = sigma

    def __repr__(self):
        return f"RBFKernel(sigma={self.sigma})"

    def __call__(self, t, tk):
        d = jnp.sum((t[:, None] - tk) ** 2, axis=-1)
        return jnp.exp(-d / (1e-8 + 2 * self.sigma**2))


class BSplineKernel(TimeKernel):
    """Cubic B-spline basis kernel over trajectory time.

    The reference README (README.md:102-104) notes B-spline smoothing is achievable
    by swapping the kernel; this provides it natively.  Uses the uniform cubic
    B-spline basis b3(|t - tk| / scale).
    """

    def __init__(self, scale=1.0):
        self.scale = scale

    def __repr__(self):
        return f"BSplineKernel(scale={self.scale})"

    def __call__(self, t, tk):
        d = jnp.sqrt(jnp.sum((t[:, None] - tk) ** 2, axis=-1)) / self.scale
        # uniform cubic B-spline basis
        inner = (2.0 / 3.0) - d**2 + 0.5 * d**3
        outer = ((2.0 - d) ** 3) / 6.0
        k = jnp.where(d < 1.0, inner, jnp.where(d < 2.0, outer, 0.0))
        return k


def support_times(T: int, num_support_pts: int, dtype):
    """Support-point and horizon time grids (mppi.py:636-640)."""
    tk = jnp.linspace(0.0, T - 1, int(num_support_pts), dtype=dtype)
    hs = jnp.linspace(0.0, T - 1, int(T), dtype=dtype)
    return tk, hs


def interpolation_operators(kernel: TimeKernel, T: int, num_support_pts: int, dtype):
    """Precompute the (T, nsp) full-horizon and (nsp, nsp) shift operators.

    full:  U(t)  = K(Hs, Tk) @ Ktktk^-1 @ theta      (mppi.py:621-627, 650-655)
    shift: theta <- K(Tk+1, Tk) @ Ktktk^-1 @ theta   (mppi.py:617-619)

    Solves happen once at setup in float64-on-CPU precision territory; the resulting
    dense operators are tiny and ride along in the params pytree.
    """
    tk, hs = support_times(T, num_support_pts, dtype)
    tk_c, hs_c = tk[:, None], hs[:, None]
    Ktktk = kernel(tk_c, tk_c)  # (nsp, nsp)
    Khs = kernel(hs_c, tk_c)  # (T, nsp)
    Kshift = kernel(tk_c + 1.0, tk_c)  # (nsp, nsp)
    # right-division: X @ Ktktk^-1  ==  solve(Ktktk^T, X^T)^T; Ktktk is symmetric
    Ktktk_np = np.asarray(Ktktk, dtype=np.float64)
    interp_full = np.linalg.solve(Ktktk_np.T, np.asarray(Khs, np.float64).T).T
    interp_shift = np.linalg.solve(Ktktk_np.T, np.asarray(Kshift, np.float64).T).T
    return jnp.asarray(interp_full, dtype), jnp.asarray(interp_shift, dtype)
