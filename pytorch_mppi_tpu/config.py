"""Static configuration and tunable-parameter pytrees for the TPU-native MPPI engine.

Design: the reference (``/root/reference/src/pytorch_mppi/mppi.py:45-199``) resolves all
optional features (bounds, step-dependency, terminal cost, diagonal sigma) into
branch-free closures at ``__init__`` time.  The JAX-native equivalent is a *frozen,
hashable* :class:`MPPIConfig` consumed by a jit-specializing solver factory: every
static field selects a trace-time branch, so the compiled program contains no runtime
feature checks at all.

Hyperparameters that autotuning mutates (sigma/mu/lambda — reference
``autotune.py:140-219``) live in :class:`MPPIParams`, a pytree *traced* by jit, so a
tuner can update them every trial with zero recompilation.  Horizon changes alter
shapes and therefore recompile, exactly as noted in SURVEY.md §7 hard-part (a).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    """Static (trace-time) MPPI configuration.

    Mirrors the constructor surface of the reference controller
    (``mppi.py:45-61``) minus the array-valued hyperparameters, which live in
    :class:`MPPIParams`.
    """

    nx: int
    nu: int
    K: int
    T: int
    M: int = 1  # rollout_samples (reference mppi.py:168)
    u_scale: float = 1.0
    u_per_command: int = 1
    rollout_var_cost: float = 0.0
    rollout_var_discount: float = 0.95
    sample_null_action: bool = False
    noise_abs_cost: bool = False
    has_terminal_cost: bool = False
    # number of trajectories a SpecificActionSampler injects (0 = no sampler);
    # static so the row-overwrite is a compile-time dynamic_update_slice
    num_specific_trajectories: int = 0
    step_dependent_dynamics: bool = False
    # JAX-native extension: dynamics takes an explicit PRNG key (stochastic models).
    # The reference relies on torch's global RNG inside user dynamics; JAX requires
    # explicit keys, so this is the idiomatic equivalent for rollout_samples > 1.
    stochastic_dynamics: bool = False
    # JAX-native extension: dynamics takes a leading params pytree (learned models).
    # The reference mutates a torch nn.Module in place during online retraining
    # (tests/pendulum_approximate.py:119-167); here model weights are *traced*
    # arguments so retraining swaps them with zero recompilation.
    parameterized_dynamics: bool = False
    # TPU-native extension (no reference counterpart): draw K/2 Gaussian samples
    # and mirror them (z, -z).  Marginals stay N(mu, Sigma); the negatively
    # correlated pairs reduce the variance of the softmax-weighted update
    # (classic antithetic-variates trick) and halve the RNG cost — sampling is
    # ~half of a K=10k solve on a v5e chip.
    antithetic: bool = False
    # TPU-native extension (MPPI-Generic's num_iters knob, arXiv:2409.07563;
    # no counterpart in the reference): repeat the sample->rollout->weight->
    # update cycle this many times inside ONE command, re-centering the
    # sampling distribution on the updated nominal sequence each time. All
    # iterations run inside the same jitted dispatch.
    num_iterations: int = 1
    # TPU-native extension (no reference counterpart): temporal AR(1)
    # correlation of the exploration noise across the horizon (0 = white,
    # the reference's behavior). Smoother candidate trajectories explore
    # low-frequency actuation much more efficiently; in the flat layout it
    # folds into the same kron mixing matmul as the covariance cholesky.
    # NOTE: for KMPPI the correlation applies across the nsp SUPPORT POINTS
    # (spaced T/nsp steps apart), so the same rho smooths more per timestep
    # than it does on MPPI/SMPPI — retune when switching variants.
    noise_rho: float = 0.0
    # TPU-native extension (no reference counterpart; the reference's only
    # risk knob is the variance penalty rollout_var_cost): risk-sensitive
    # CVaR aggregation over the M stochastic rollouts.  0 = off (the
    # reference's mean).  alpha in (0, 1] replaces the mean over M with the
    # mean of the worst ceil(alpha*M) rollout costs per trajectory —
    # planning against the alpha-tail of the dynamics noise instead of its
    # expectation.  Static, so it resolves to one trace-time top_k on the M
    # axis; composes with rollout_var_cost; requires M > 1.
    risk_alpha: float = 0.0
    # TPU-native extension (MPOPI, arXiv:2203.16633; no reference counterpart):
    # within-command covariance adaptation.  After each of the
    # ``num_iterations`` update cycles, re-estimate the sampling covariance
    # from the omega-weighted rectified-noise ensemble (a CMA-style rank-mu
    # estimate averaged over the horizon) and blend it into the current
    # sigma:  sigma <- (1-lr)*sigma + lr*(cov_hat + floor*I).  The adapted
    # sigma drives the NEXT iteration's sampling and action cost, then
    # resets to ``params.noise_sigma`` at the next command — so tuners and
    # setters keep full control of the base covariance.  Only meaningful
    # with num_iterations > 1 (with one iteration there is no next sampling
    # step to drive).  With ``diag_sigma`` only the diagonal is adapted,
    # keeping the static elementwise fast path valid.
    adaptive_covariance: bool = False
    # blend rate in (0, 1]: 1.0 replaces sigma with the weighted-ensemble
    # estimate each iteration (pure CMA-style re-estimation); smaller values
    # smooth the adaptation across iterations
    adaptive_cov_lr: float = 0.5
    # PSD guard added to the ensemble estimate so a collapsed ensemble
    # (omega concentrated on one sample) can never drive sigma singular
    adaptive_cov_floor: float = 1e-6
    # TPU-native extension (iCEM-style elite reuse, Pinneri et al. 2020,
    # arXiv:2008.06389 §3; no reference counterpart): keep the num_elites
    # lowest-cost perturbed trajectories from the previous optimization
    # cycle, time-shift them like the nominal sequence, and re-inject them
    # as sample rows of the next cycle (after the null-action / specific-
    # sampler rows).  The elite rows survive distribution shift: a good
    # trajectory found at step t stays in the candidate set at t+1 even if
    # the re-centered Gaussian would be unlikely to re-draw it — at small K
    # this is a large sample-efficiency win.  Elites thread through
    # ``MPPIState.elites`` ((num_elites, T, nu)), update after every
    # iteration (including across ``num_iterations`` within one command),
    # and are excluded from the adaptive-covariance rank-mu estimate like
    # all injected rows.  0 = off (reference semantics).  MPPI only.
    num_elites: int = 0
    # TPU-native extension (gradient-accelerated MPPI, cf. the Gauss-Newton
    # MPPI line of work, arXiv:2512.04579; no reference counterpart — torch
    # autograd through the rollout is possible but the reference never does
    # it, while here the whole solve is already differentiable by design,
    # docs/DESIGN.md §8): after the sampling update(s), descend the nominal
    # sequence directly on the task cost J(U) = rollout cost of U (running +
    # terminal + variance/CVaR terms, exactly what rollout_costs computes)
    # with this many projected-Adam steps, clamping into [u_min, u_max] after
    # every step.  The sampling stage provides global exploration; the
    # gradient stage polishes the local optimum the samples found — at small
    # K this buys large quality gains for a few extra rollouts' FLOPs.  The
    # refined U is what command() returns AND what shifts into the next
    # command.  0 = off (bit-identical to the reference semantics).  MPPI
    # only (SMPPI/KMPPI sample in lifted spaces; the factories reject it).
    gradient_refinement_steps: int = 0
    # Adam step size of the refinement, in action units
    gradient_refinement_lr: float = 0.05
    # Diagonal-covariance fast path, detected statically at construction
    # (mirrors the reference's init-time diag detection, mppi.py:131-139):
    # the noise correlation reduces to an elementwise lane scale instead of
    # the kron(I, chol^T) MXU matmul — faster, and bit-identical across
    # backends (TPU matmuls default to bf16 input precision).  The controller
    # re-specializes if a setter flips diagonality; tuners (SigmaParameter)
    # only touch the diagonal, so tuning stays on this path with zero
    # recompilation.
    diag_sigma: bool = False
    # Unroll factor for the T-step rollout scan (lax.scan unroll=).  The scan's
    # per-step loop overhead is ~18% of a K=10k/T=30 solve on v5e; full unroll
    # (scan_unroll=T, or pass scan_unroll=0 for "always full") recovers it at
    # the cost of longer compiles and bigger programs.  Default 1 keeps
    # change_horizon/tuning loops cheap to re-specialize.
    scan_unroll: int = 1
    # Keep the noise/perturbed-action artifact surface when `use_pallas`
    # routes to a fused kernel: the kernel additionally stores the clamped
    # perturbed actions to HBM (one (T·nu, K) f32 tensor, ~2.4 MB at the
    # flagship shape) and the rectified noise reconstructs outside with the
    # kernel's own subtraction, bit-exactly.  Off by default — the fused
    # path's whole point is that these tensors never touch HBM.  Ignored on
    # the XLA path (which always carries full artifacts).  The K-sharded
    # fused path emits per-shard and concatenates to the global (K, T, nu);
    # the N-plant batched fused kernel (whose point is keeping the
    # (N, K, T*nu) tensors out of HBM) declines and falls back to XLA.
    fused_artifacts: bool = False
    dtype: Any = jnp.float32

    # SMPPI extras (reference mppi.py:451-570). Only read by the SMPPI factory.
    smppi: bool = False

    # KMPPI extras (reference mppi.py:593-688). Only read by the KMPPI factory.
    num_support_pts: int = 0

    def __post_init__(self):
        # normalize dtype to a hashable canonical dtype object
        object.__setattr__(self, "dtype", jnp.dtype(self.dtype))
        # scan_unroll=0 means "full unroll"; clamp to the horizon
        u = int(self.scan_unroll)
        object.__setattr__(
            self, "scan_unroll", self.T if u in (0, -1) else max(1, min(u, self.T))
        )

    @property
    def store_rollouts(self) -> bool:
        """Lazy-storage contract: rollout states/actions are only materialized when a
        terminal cost needs them (reference mppi.py:307-331; pinned by
        tests/test_mppi.py:241-260) or when M>1 (mppi.py:350-351)."""
        return self.has_terminal_cost or self.M > 1


class MPPIParams(NamedTuple):
    """Tunable (traced) hyperparameters — a jit-transparent pytree.

    ``noise_sigma`` is always stored as a full (nu, nu) covariance; the Cholesky
    factor and inverse are derived *inside* the jitted solve (nu is tiny, the cost is
    negligible) which guarantees the sampler can never go stale when a tuner swaps
    sigma — fixing the vestigial ``noise_dist`` bug noted in SURVEY.md §2.2 A5.
    """

    noise_mu: jax.Array  # (nu,)
    noise_sigma: jax.Array  # (nu, nu)
    lambda_: jax.Array  # scalar
    u_min: jax.Array  # (nu,) broadcastable; -inf when unbounded (mppi.py:120-126)
    u_max: jax.Array  # (nu,)
    u_init: jax.Array  # (nu,)


class SMPPIParams(NamedTuple):
    """SMPPI adds action-space bounds and smoothing weights (mppi.py:456-477)."""

    base: MPPIParams
    action_min: jax.Array  # (nu,)
    action_max: jax.Array  # (nu,)
    w_action_seq_cost: jax.Array  # scalar
    delta_t: jax.Array  # scalar


class KMPPIParams(NamedTuple):
    """KMPPI adds precomputed kernel-interpolation operators.

    The reference re-solves ``linalg.solve(Ktktk, K)`` per call under torch.vmap
    (mppi.py:636-655).  On TPU both operators are constant for a fixed horizon, so we
    precompute them once: deparameterization becomes a single (T, nsp) @ (K, nsp, nu)
    MXU matmul (SURVEY.md §3.3 boundary note).
    """

    base: MPPIParams
    interp_full: jax.Array  # (T, nsp):   K(Hs,Tk) @ inv(K(Tk,Tk))
    interp_shift: jax.Array  # (nsp, nsp): K(Tk+1,Tk) @ inv(K(Tk,Tk))


class MPPIState(NamedTuple):
    """Controller state threaded through solves — the explicit-pytree analog of the
    reference's mutable ``self.U`` (mppi.py:140-145) plus the PRNG key that torch
    keeps in global state."""

    U: jax.Array  # (T, nu) nominal control sequence
    key: jax.Array  # PRNG key
    # (num_elites, T, nu) best perturbed trajectories of the previous cycle
    # (iCEM-style reuse, MPPIConfig.num_elites), or None when the feature is
    # off — the default keeps old checkpoints loadable (decode fills missing
    # trailing NamedTuple fields from defaults)
    elites: Optional[jax.Array] = None


class SMPPIState(NamedTuple):
    U: jax.Array  # (T, nu) — lifted action-*rate* sequence (mppi.py:484)
    action_sequence: jax.Array  # (T, nu) — commanded actions (mppi.py:481)
    key: jax.Array


class KMPPIState(NamedTuple):
    U: jax.Array  # (T, nu)
    theta: jax.Array  # (nsp, nu) control points (mppi.py:600)
    key: jax.Array


class Artifacts(NamedTuple):
    """Per-solve introspection artifacts, the functional equivalent of the
    reference's public-ish attributes (mppi.py:179-184, 407-417; consumed by e.g.
    tests/smooth_mppi.py:346-359)."""

    cost_total: jax.Array  # (K,)
    cost_total_non_zero: jax.Array  # (K,)
    omega: jax.Array  # (K,)
    noise: jax.Array  # (K, T, nu) rectified noise
    perturbed_action: jax.Array  # (K, T, nu)
    states: Optional[jax.Array]  # (M, K, T, nx) or None (lazy-storage contract)
    actions: Optional[jax.Array]  # (M, K, T, nu) unscaled, or None


def as_dtype_array(value, dtype, shape=None):
    """Coerce python scalars / numpy / jax arrays to a jnp array of ``dtype``."""
    arr = jnp.asarray(value, dtype=dtype)
    if shape is not None:
        arr = jnp.broadcast_to(arr, shape)
    return arr
