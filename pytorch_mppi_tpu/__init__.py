"""pytorch_mppi_tpu — a TPU-native Model Predictive Path Integral control framework.

Re-implements the full capability surface of UM-ARM-Lab/pytorch_mppi
(reference at ``/root/reference``) as an idiomatic JAX/XLA/Pallas/pjit framework:
single-dispatch jitted MPC solves, mesh-sharded scenario batches, and fused TPU
kernels for the hot rollout + weighting path.

Public API mirrors the reference package root (``src/pytorch_mppi/__init__.py:1``).
"""

from .config import (
    Artifacts,
    KMPPIParams,
    KMPPIState,
    MPPIConfig,
    MPPIParams,
    MPPIState,
    SMPPIParams,
    SMPPIState,
)
from .controller import KMPPI, MPPI, MPPI_Batched, SMPPI, SpecificActionSampler
from .ops.kernels import BSplineKernel, RBFKernel, TimeKernel
from .runner import run_mppi, run_mppi_jit
from .utils.batch import batch_quadratic_product, ensure_tensor, handle_batch_input

__version__ = "0.3.0"

__all__ = [
    "MPPI",
    "SMPPI",
    "KMPPI",
    "MPPI_Batched",
    "SpecificActionSampler",
    "TimeKernel",
    "RBFKernel",
    "BSplineKernel",
    "run_mppi",
    "run_mppi_jit",
    "handle_batch_input",
    "ensure_tensor",
    "batch_quadratic_product",
    "MPPIConfig",
    "MPPIParams",
    "MPPIState",
    "SMPPIParams",
    "SMPPIState",
    "KMPPIParams",
    "KMPPIState",
    "Artifacts",
]
