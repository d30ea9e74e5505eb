"""Pure-functional MPPI solve core, jit-specialized per configuration.

This is the TPU-native redesign of the reference controller's hot path
(``/root/reference/src/pytorch_mppi/mppi.py:240-448``).  Where the reference runs an
eager Python loop that launches ~2·T kernels per solve (mppi.py:312-331), here the
*entire* solve — noise sampling, specific-action injection, bound rectification,
T-step rollout, running/terminal costs, softmax weighting and the nominal-trajectory
update — is one traced program under ``jax.jit``:

  * the T-step rollout is a ``lax.scan`` (sequential by nature, SURVEY.md §5.7);
  * the K (samples) and M (stochastic rollouts) axes are flat batch dimensions that
    XLA tiles onto the VPU/MXU;
  * the weighted update is a single (K,)·(K, T·nu) matmul on the MXU;
  * one host→device transfer in (x0), one device→host transfer out (the action, and
    only if the caller forces it).

All feature flags are static fields of :class:`~pytorch_mppi_tpu.config.MPPIConfig`,
so each configuration compiles to a branch-free program — the trace-time analog of
the reference's init-time closure resolution (mppi.py:120-199).
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger(__name__)

from ..config import (
    Artifacts,
    KMPPIParams,
    KMPPIState,
    MPPIConfig,
    MPPIParams,
    MPPIState,
    SMPPIParams,
    SMPPIState,
)

# ---------------------------------------------------------------------------
# Small numeric helpers
# ---------------------------------------------------------------------------


def make_constrainer(mesh):
    """Return a ``with_sharding_constraint`` helper bound to ``mesh`` (identity when
    mesh is None).  This is the scaling-book recipe: annotate the big intermediates,
    let XLA's SPMD partitioner insert the psum/pmin collectives (SURVEY.md §5.8 —
    the only cross-device reductions MPPI needs are beta, eta and the omega-weighted
    noise reduction)."""
    if mesh is None:
        return lambda x, *spec: x

    from jax.sharding import NamedSharding, PartitionSpec

    def cset(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    return cset


def _sigma_factors(noise_sigma: jax.Array, diag: bool = False):
    """Cholesky factor and inverse of the (nu, nu) control covariance.

    Derived inside the traced solve so tuner updates to sigma can never go stale
    (fixes the vestigial ``noise_dist`` issue, reference autotune.py:161,188).
    nu is tiny (<= a few tens) so this costs nothing next to the rollout.  For a
    diagonal sigma, cholesky == diag(sqrt) and the math reduces exactly to the
    reference's diagonal fast path (mppi.py:131-139, 186-206).

    With ``diag`` (the statically-detected diagonal covariance), the LAPACK
    cholesky/LU custom calls — which XLA cannot fuse, a fixed per-solve
    overhead — are replaced by elementwise sqrt/reciprocal of the diagonal,
    which fuse into the sampling pipeline.
    """
    out_dtype = noise_sigma.dtype
    if diag:
        d = jnp.diagonal(noise_sigma)
        return (
            jnp.diag(jnp.sqrt(d)).astype(out_dtype),
            jnp.diag(1.0 / d).astype(out_dtype),
        )
    if out_dtype not in (jnp.float32, jnp.float64):
        # jnp.linalg has no bf16/f16 kernels; nu is tiny so factor in f32
        noise_sigma = noise_sigma.astype(jnp.float32)
    chol = jnp.linalg.cholesky(noise_sigma)
    sigma_inv = jnp.linalg.inv(noise_sigma)
    return chol.astype(out_dtype), sigma_inv.astype(out_dtype)


def sample_noise(key: jax.Array, leading_shape, params: MPPIParams, dtype) -> jax.Array:
    """Draw N(mu, Sigma) control noise of shape ``(*leading_shape, nu)``.

    Equivalent of reference ``MPPI._sample_noise`` (mppi.py:201-206) with an explicit
    PRNG key instead of torch global RNG state.
    """
    nu = params.noise_mu.shape[-1]
    chol, _ = _sigma_factors(params.noise_sigma)
    z = jax.random.normal(key, (*leading_shape, nu), dtype=dtype)
    return z @ chol.T + params.noise_mu


def ar1_mixing(reps: int, rho: float, dtype) -> jax.Array:
    """Lower-triangular AR(1) mixing matrix A with unit row norms:
    z_t = rho z_{t-1} + sqrt(1-rho^2) eps_t  ==>  A[t, s] = rho^(t-s) *
    (sqrt(1-rho^2) if s > 0 else 1) for s <= t.  Row norms are exactly 1, so
    per-step marginals stay N(0, 1) while lag-1 correlation is rho."""
    t = jnp.arange(reps)[:, None]
    s = jnp.arange(reps)[None, :]
    # build in f32 (not f64: with x64 disabled an explicit f64 request emits a
    # warning per trace and silently truncates anyway); rho powers over a
    # control horizon are comfortably within f32 range/precision
    r = jnp.float32(rho)
    pw = jnp.where(s <= t, r ** (t - s).astype(jnp.float32), jnp.float32(0))
    scale = jnp.where(s > 0, jnp.sqrt(jnp.float32(1) - r * r), jnp.float32(1))
    return (pw * scale).astype(dtype)


def sample_noise_flat(key: jax.Array, K: int, reps: int, params: MPPIParams, dtype,
                      antithetic: bool = False, chol=None,
                      noise_rho: float = 0.0, diag_sigma: bool = False) -> jax.Array:
    """Draw N(mu, Sigma) control noise in flat lane-dense ``(K, reps*nu)`` layout.

    Equivalent to ``sample_noise(key, (K, reps), ...)`` reshaped row-major:
    identical underlying draws (same key, same element order) — but the whole
    pipeline stays 2-D: TPU tiles the two minor dims (8, 128), so the 3-D
    ``(K, reps, nu)`` form lane-pads ~64x on every elementwise pass when nu is
    small.  The per-timestep ``z @ chol^T`` correlation becomes one MXU matmul
    against the block-diagonal operator ``kron(I_reps, chol^T)``; the zero
    blocks contribute exactly nothing, so the result is bit-identical for
    diagonal covariance and within one FMA rounding (dot-product association)
    for full covariance.

    With ``diag_sigma`` (the controller detects diagonality statically at
    construction, mirroring the reference's init-time fast path,
    mppi.py:131-139) and white noise, the correlation reduces to an
    elementwise scale: no MXU pass at all, and — unlike the matmul, which TPUs
    run at bf16 input precision by default — **bit-identical across
    backends**.
    """
    nu = params.noise_mu.shape[-1]
    if chol is None:
        chol, _ = _sigma_factors(params.noise_sigma, diag=diag_sigma)
    if antithetic:
        # draw K/2, mirror: marginals stay N(0, I), pairs are perfectly
        # negatively correlated (variance reduction + half the RNG cost)
        Kh = (K + 1) // 2
        z_half = jax.random.normal(key, (Kh, reps * nu), dtype)
        z2 = jnp.concatenate([z_half, -z_half], axis=0)[:K]
    else:
        z2 = jax.random.normal(key, (K, reps * nu), dtype)
    if diag_sigma and not noise_rho:
        # the chol of a diagonal sigma is diag(sqrt): scale lanes elementwise
        scale = jnp.tile(jnp.diagonal(chol).astype(dtype), reps)
        return z2 * scale + jnp.tile(params.noise_mu, reps)
    if noise_rho:
        # temporal AR(1) correlation folds into the same mixing operator:
        # noise[k, t] = sum_s A[t, s] (z[k, s] @ chol^T).  In the row-vector
        # convention (z2 @ C) the time factor must enter TRANSPOSED:
        # (z2 @ kron(M, cholT))[k, t] = sum_s M[s, t] (...), so M = A^T.
        C = jnp.kron(ar1_mixing(reps, noise_rho, dtype).T, chol.T.astype(dtype))
    else:
        C = jnp.kron(jnp.eye(reps, dtype=dtype), chol.T.astype(dtype))
    return z2 @ C + jnp.tile(params.noise_mu, reps)


def compute_weighting(cost_total: jax.Array, lambda_: jax.Array, axis=-1):
    """beta/eta/omega softmax weighting (reference mppi.py:12-13, 254-259)."""
    beta = jnp.min(cost_total, axis=axis, keepdims=True)
    cost_total_non_zero = jnp.exp(-(cost_total - beta) / lambda_)
    eta = jnp.sum(cost_total_non_zero, axis=axis, keepdims=True)
    omega = cost_total_non_zero / eta
    return cost_total_non_zero, omega


def _bound(action: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Branch-free clamp; lo/hi are +-inf when unbounded (mppi.py:120-126, 419-420)."""
    return jnp.clip(action, lo, hi)


def adapt_covariance(config: MPPIConfig, sigma: jax.Array, omega: jax.Array,
                     noise: jax.Array, n_injected: int = 0) -> jax.Array:
    """Within-command covariance adaptation (MPOPI, arXiv:2203.16633; net-new
    vs the reference, whose sigma is fixed for the life of the controller).

    ``noise`` is the (K, T, nu) omega-weighted rectified-noise ensemble of the
    iteration that just ran.  The estimate is the CMA-style *rank-mu* second
    moment around the OLD mean — the raw noise already is the deviation from
    the pre-update nominal, so no centering is applied — averaged over the
    horizon (sigma is one (nu, nu) matrix shared across t, as in the
    reference).  Clamped noise shrinks the estimate near saturated bounds,
    which usefully stops pushing exploration variance into regions the clamp
    would truncate anyway.  A ``floor * I`` PSD guard keeps the blend
    invertible even if omega collapses onto a single sample.
    """
    dtype = sigma.dtype
    T = noise.shape[-2]
    nu = noise.shape[-1]
    omega = omega.astype(dtype)
    lr = jnp.asarray(config.adaptive_cov_lr, dtype)
    safe = None
    if n_injected:
        # Injected rows (null action / specific-action-sampler trajectories,
        # inject_specific_actions) are NOT draws from the sampling
        # distribution — the null row's "noise" is -U — so blending them in
        # would drag sigma toward U·U^T/T whenever omega concentrates on an
        # injected row (common near the goal for the null action).  Mask them
        # out and renormalize omega over the pure-noise rows; n_injected is
        # static, so this is a compile-time slice.
        omega = omega.at[:n_injected].set(0.0)
        w_sum = jnp.sum(omega)
        safe = w_sum > jnp.asarray(1e-12, dtype)
        omega = omega / jnp.where(safe, w_sum, jnp.ones_like(w_sum))
    if config.diag_sigma:
        # stay on the static diagonal fast path: adapt the diagonal only
        var = jnp.einsum("k,ktu->u", omega, jnp.square(noise)) / T
        cov = jnp.diag(var)
    else:
        cov = jnp.einsum("k,ktu,ktv->uv", omega, noise, noise) / T
    cov = cov + jnp.asarray(config.adaptive_cov_floor, dtype) * jnp.eye(nu, dtype=dtype)
    blended = (1 - lr) * sigma + lr * cov
    if safe is not None:
        # omega collapsed entirely onto injected rows: no sampling-noise
        # information this iteration — keep the current sigma
        blended = jnp.where(safe, blended, sigma)
    return blended


# ---------------------------------------------------------------------------
# Dynamics / cost adapters
# ---------------------------------------------------------------------------


def _adapt_batch_rank(call: Callable) -> Callable:
    """``handle_batch_input(n=2)`` semantics (reference mppi.py:221-227)
    applied to the resolved ``(state, action)`` pair: a user function written
    for flat 2-D batches transparently accepts inputs with extra leading batch
    dimensions — they are flattened before the call and restored on every
    output.  Under jit the rank check resolves at trace time, and the engine's
    hot paths always pass 2-D, so this costs nothing there."""

    def adapted(s, u, *rest):
        if s.ndim <= 2:
            return call(s, u, *rest)
        lead = s.shape[:-1]
        out = call(s.reshape(-1, s.shape[-1]), u.reshape(-1, u.shape[-1]), *rest)
        return jax.tree_util.tree_map(
            lambda r: r.reshape(*lead, *r.shape[1:]), out
        )

    return adapted


def wrap_dynamics(config: MPPIConfig, dynamics: Callable) -> Callable:
    """Resolve the user dynamics to a uniform ``(dyn_params, state, u, t, key) ->
    next_state`` signature at trace time (analog of reference init wrapping,
    mppi.py:147-156), with batch-rank adaptation on the (state, action) pair
    (reference wraps via handle_batch_input(n=2), mppi.py:221-227).  The
    leading params pytree is only forwarded when ``parameterized_dynamics`` is
    set (learned models, traced weights)."""
    if config.parameterized_dynamics:
        if config.stochastic_dynamics:
            if config.step_dependent_dynamics:
                base = lambda p, s, u, t, k: dynamics(p, s, u, t, k)
            else:
                base = lambda p, s, u, t, k: dynamics(p, s, u, k)
        elif config.step_dependent_dynamics:
            base = lambda p, s, u, t, k: dynamics(p, s, u, t)
        else:
            base = lambda p, s, u, t, k: dynamics(p, s, u)
    elif config.stochastic_dynamics:
        if config.step_dependent_dynamics:
            base = lambda p, s, u, t, k: dynamics(s, u, t, k)
        else:
            base = lambda p, s, u, t, k: dynamics(s, u, k)
    elif config.step_dependent_dynamics:
        base = lambda p, s, u, t, k: dynamics(s, u, t)
    else:
        base = lambda p, s, u, t, k: dynamics(s, u)
    adapted = _adapt_batch_rank(lambda s, u, p, t, k: base(p, s, u, t, k))
    return lambda p, s, u, t, k: adapted(s, u, p, t, k)


def wrap_cost(config: MPPIConfig, running_cost: Callable) -> Callable:
    """Resolve the user running cost to ``(state, u, t) -> cost`` with the same
    batch-rank adaptation as :func:`wrap_dynamics`."""
    if config.step_dependent_dynamics:
        return _adapt_batch_rank(running_cost)
    return _adapt_batch_rank(lambda s, u, t: running_cost(s, u))


def wrap_final_cost(terminal_final_cost: Callable) -> Callable:
    """Resolve the user FINAL-STATE terminal cost ``(final_state (..., nx),
    final_action (..., nu)) -> cost (...)`` with the same batch-rank
    adaptation as :func:`wrap_cost`.  This is the TPU-native terminal-cost
    variant (net-new vs the reference, whose only terminal hook consumes the
    FULL (K, T, nx) rollout storage, mppi.py:307-331): a terminal cost that
    declares itself a function of the last step only lets the engine keep the
    lazy-storage contract (no (M, K, T, nx) states tensor in HBM) and keeps
    the fused transposed kernels eligible — the final state is live in the
    scan carry / kernel registers either way."""
    return _adapt_batch_rank(terminal_final_cost)


def _gate_terminal(terminal_state_cost, terminal_final_cost):
    """The two terminal hooks are mutually exclusive: the full-trajectory one
    forces rollout storage, the final-state one exists to avoid it — silently
    combining them would hide which contract is paying for what."""
    if terminal_state_cost is not None and terminal_final_cost is not None:
        raise ValueError(
            "terminal_state_cost and terminal_final_cost are mutually "
            "exclusive: use terminal_state_cost for costs over the full "
            "(K, T, nx) trajectory, terminal_final_cost for costs of the "
            "final state only (keeps lazy storage and fused-kernel "
            "eligibility)"
        )


# ---------------------------------------------------------------------------
# Rollout engine (the hot loop)
# ---------------------------------------------------------------------------


def rollout_costs(
    config: MPPIConfig,
    dynamics: Callable,  # already wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # already wrapped: (state, u, t) -> cost
    terminal_state_cost: Optional[Callable],
    specific_dynamics: Optional[Callable],
    params: MPPIParams,
    x0: jax.Array,  # (nx,) or (K, nx), already coerced to config.dtype
    perturbed_actions: jax.Array,  # (K, T, nu) unscaled
    key: jax.Array,
    dyn_params=None,
    terminal_final_cost: Optional[Callable] = None,  # wrapped: (state, u) -> cost
):
    """T-step rollout of K·M trajectories, returning (cost_total (K,), states, actions).

    Functional fusion of reference ``_compute_rollout_costs_{single,multi}``
    (mppi.py:292-373): M is folded into the batch axis, the running cost is evaluated
    at the *next* state exactly as the reference does (mppi.py:314-318), and rollout
    state/action storage obeys the lazy-storage contract (states/actions are only
    materialized when a terminal cost or M>1 requires them, mppi.py:307-331).
    """
    K, T, nu = perturbed_actions.shape
    M = config.M
    nx_in = x0.shape[-1]
    dtype = config.dtype

    if x0.ndim == 2:  # (K, nx) sampled initial states (mppi.py:302-305)
        state0 = x0
    else:
        state0 = jnp.broadcast_to(x0[None, :], (K, nx_in))
    # fold M into the batch axis: (M*K, nx) flat batch, one dynamics call per step
    state0 = jnp.broadcast_to(state0[None], (M, K, nx_in)).reshape(M * K, nx_in)

    # (T, K, nu) scaled actions as scan inputs
    u_scaled = jnp.swapaxes(perturbed_actions, 0, 1) * jnp.asarray(
        config.u_scale, dtype
    )
    step_keys = jax.random.split(key, T) if config.stochastic_dynamics else jnp.zeros((T, 1), dtype=jnp.uint32)

    store = config.store_rollouts
    var_on = M > 1

    def body(carry, inp):
        state, cost_samples, cost_var = carry
        u_t, t, k_t = inp  # u_t: (K, nu)
        u_flat = jnp.broadcast_to(u_t[None], (M, K, nu)).reshape(M * K, nu)
        next_state = dynamics(dyn_params, state, u_flat, t, k_t)
        if specific_dynamics is not None:
            # signature (next, state, u, t), matching the reference EXACTLY per
            # path — both of its paths have quirks a user's hook may read, so
            # we replicate them rather than "fix" them (equivalence-pinned in
            # tests/test_reference_equivalence.py): the M=1 fast path passes
            # the *new* state for both state args (mppi.py:315-317); the M>1
            # path passes the *initial* state x0 at every timestep, because
            # the reference only ever updates `state_flat`, never `state`,
            # inside its loop (mppi.py:349-361).  M is static, so this
            # resolves at trace time.
            s3 = next_state.reshape(M, K, -1)
            p3 = s3 if M == 1 else state0.reshape(M, K, -1)
            u3 = u_flat.reshape(M, K, nu)
            next_state = specific_dynamics(s3, p3, u3, t).reshape(M * K, -1)
        c = running_cost(next_state, u_flat, t).reshape(M, K)
        cost_samples = cost_samples + c
        if var_on:
            disc = jnp.asarray(config.rollout_var_discount, dtype) ** t.astype(dtype)
            cost_var = cost_var + jnp.var(c, axis=0, ddof=1) * disc
        ys = None
        if store:
            ys = (
                next_state.reshape(M, K, -1)[..., : config.nx],
                u_flat.reshape(M, K, nu),
            )
        return (next_state, cost_samples, cost_var), ys

    init = (
        state0,
        jnp.zeros((M, K), dtype),
        jnp.zeros((K,), dtype),
    )
    ts = jnp.arange(T)
    (final_state, cost_samples, cost_var), ys = lax.scan(
        body, init, (u_scaled, ts, step_keys), unroll=config.scan_unroll
    )

    states = actions = None
    if store:
        # (T, M, K, ·) -> (M, K, T, ·) to match the reference layout (mppi.py:309-310)
        states = jnp.moveaxis(ys[0], 0, 2)
        actions = jnp.moveaxis(ys[1], 0, 2)
        if terminal_state_cost is not None:
            c = terminal_state_cost(states, actions)
            c = jnp.asarray(c, dtype)
            # broadcast (K,) or (M, K) terminal costs onto cost_samples (mppi.py:324-328, 369-370)
            cost_samples = cost_samples + c
    if terminal_final_cost is not None:
        # final-state terminal cost (net-new, see wrap_final_cost): evaluated
        # on the scan CARRY — no rollout storage required; the final action is
        # u_scale-SCALED, matching what the full-terminal hook sees in the
        # stored actions tensor (scaled before the scan, mppi.py:313)
        u_last = jnp.broadcast_to(u_scaled[-1][None], (M, K, nu)).reshape(M * K, nu)
        c = terminal_final_cost(final_state[..., : config.nx], u_last)
        cost_samples = cost_samples + jnp.asarray(c, dtype).reshape(M, K)
    if var_on and config.risk_alpha > 0.0:
        # risk-sensitive aggregation (TPU-native extension; the reference's
        # only risk knob is the variance penalty below): CVaR_alpha over the
        # M stochastic rollouts = mean of the worst ceil(alpha*M) sample
        # costs per trajectory.  alpha is static, so this is one top_k on
        # the M axis at trace time; alpha=1 recovers the mean (up to
        # summation order).
        m_w = max(1, min(M, int(math.ceil(config.risk_alpha * M))))
        worst, _ = lax.top_k(cost_samples.T, m_w)  # (K, m_w), descending
        cost_total = jnp.mean(worst, axis=-1)
    else:
        cost_total = jnp.mean(cost_samples, axis=0)
    if var_on:
        cost_total = cost_total + cost_var * jnp.asarray(config.rollout_var_cost, dtype)
    return cost_total, states, actions


# ---------------------------------------------------------------------------
# Specific-action injection
# ---------------------------------------------------------------------------


def inject_specific_actions(
    config: MPPIConfig,
    sample_trajectories: Optional[Callable],
    perturbed_action: jax.Array,  # (K, T_or_nsp, nu)
    x0: jax.Array,
    info,
    elites: Optional[jax.Array] = None,  # (num_elites, T, nu)
):
    """Overwrite leading rows of the sample set with domain-knowledge trajectories
    (reference ``_sample_specific_actions``, mppi.py:387-400) and, when elite
    reuse is on (``MPPIConfig.num_elites``, iCEM-style), with the shifted best
    trajectories of the previous cycle.  Row indices are static, so this lowers
    to compile-time slice updates."""
    i = 0
    if config.sample_null_action:
        perturbed_action = perturbed_action.at[0].set(0.0)
        i = 1
    n = config.num_specific_trajectories
    if sample_trajectories is not None and n > 0:
        acts = sample_trajectories(x0, info)
        acts = jnp.asarray(acts, config.dtype).reshape(
            n, perturbed_action.shape[1], perturbed_action.shape[2]
        )
        perturbed_action = lax.dynamic_update_slice(perturbed_action, acts, (i, 0, 0))
        i += n
    if elites is not None and config.num_elites > 0:
        perturbed_action = lax.dynamic_update_slice(
            perturbed_action, elites.astype(perturbed_action.dtype), (i, 0, 0)
        )
    return perturbed_action


# ---------------------------------------------------------------------------
# Step factories — MPPI
# ---------------------------------------------------------------------------


class StepFns(NamedTuple):
    """Bundle of jitted entry points produced by a factory."""

    step: Callable  # (params, state, x0, info) -> (state, action, Artifacts)  [with shift]
    step_no_shift: Callable  # same, without the nominal-trajectory shift
    get_rollouts: Callable  # (params, state, x0 (R, nx), U (T, nu)) -> (R, T, nx)


def _transposed_operands(noise_sigma, noise_mu, u_min, u_max, config, reps,
                         nu, dtype):
    """Per-solve operands of the transposed kernels, shared by all four fused
    iterations: sampler factors, the noise operator (per-lane scale for
    white-diagonal sigma, else the ``kron(A_rho, chol)`` transposed mixing
    matrix), and the ``reps``-tiled mu/bounds columns."""
    chol, sigma_inv = _sigma_factors(noise_sigma, diag=config.diag_sigma)
    if config.diag_sigma and not config.noise_rho:
        op = jnp.tile(jnp.diagonal(chol).astype(dtype), reps)
    else:
        mix = (
            ar1_mixing(reps, config.noise_rho, dtype)
            if config.noise_rho
            else jnp.eye(reps, dtype=dtype)
        )
        op = jnp.kron(mix, chol.astype(dtype))
    mu_t = jnp.tile(noise_mu, reps)
    lo = jnp.tile(jnp.broadcast_to(u_min, (nu,)).astype(dtype), reps)
    hi = jnp.tile(jnp.broadcast_to(u_max, (nu,)).astype(dtype), reps)
    return sigma_inv, op, mu_t, lo, hi


def _x0_to_lanes(x0, K):
    """(nx,) shared or (K, nx) per-sample initial states -> (nx, K)."""
    if x0.ndim == 2:
        return x0.T
    return jnp.broadcast_to(x0[:, None], (x0.shape[-1], K))


class FusedSolveUnavailable(ValueError):
    """A fused-kernel configuration constraint failed (e.g. shard
    divisibility) — routing treats this as 'fall back to the XLA path',
    unlike arbitrary ValueErrors from tracing user code, which surface."""


def _make_sharded_solve(config, local_builder, mesh, sample_axis: str,
                        rng_in_kernel: bool = True, nargs_after_x0: int = 7,
                        emit: bool = False):
    """A transposed fused kernel under ``shard_map``: K sharded over
    ``sample_axis``, each shard running its own kernel over K_local, with the
    streaming-softmax statistics combined across shards by three small
    collectives riding ICI — exactly the reductions a sharded MPPI solve
    needs (SURVEY.md §5.8):

        m_g = pmax(m_l);  s_g = psum(s_l · e^{m_l − m_g});
        delta_g = psum(delta_l · e^{m_l − m_g})

    (the flash-softmax merge rule, associative and order-stable under pmax).
    Works for every single-plant variant kernel because they share the call
    convention ``(lead, x0T, *replicated_operands) -> (delta, m, s, cost)``:
    arg 0 is the seed (or a global (rows, K) bits array for CPU-mesh tests,
    sharded on its lane axis), arg 1 is the lane-sharded x0T, and the
    remaining ``nargs_after_x0`` operands are replicated.  Per-shard noise
    streams derive from the same per-solve seed offset by ``axis_index *
    local_nblocks``, so runs are deterministic for a fixed mesh; the stream
    differs from the unsharded kernel's (documented — the hardware-PRNG
    stream is a per-layout property).  cost_total comes back K-sharded.

    ``local_builder(local_config)`` must return the per-shard solve.

    ``sample_null_action`` is handled by the per-shard kernels' dynamic null
    gate (``axis_index == 0`` — exactly one shard zeroes its first sample,
    which IS global sample 0 since x0T/cost shard contiguously along K).
    With ``emit`` the per-shard kernels emit their clamped perturbed actions
    and the solve returns a fifth element: the K-sharded global (D, K)
    perturbed tensor (``fused_artifacts``).
    """
    from jax.sharding import PartitionSpec as P

    from . import pallas_rollout as PR

    shard_map = jax.shard_map

    import dataclasses

    nshards = mesh.shape[sample_axis]
    if config.K % nshards:
        raise FusedSolveUnavailable(
            f"K={config.K} must divide evenly over the {nshards}-way "
            f"{sample_axis!r} mesh axis for the sharded fused solve"
        )
    K_local = config.K // nshards
    local_cfg = dataclasses.replace(config, K=K_local)
    local_solve = local_builder(local_cfg)
    # the per-shard seed offset must use the block count the kernel ACTUALLY
    # runs (the factory exports it) — re-deriving it here could silently
    # overlap shard noise streams if a factory's block policy changes
    local_nblocks = local_solve.nblocks
    if not rng_in_kernel and local_solve.K_pad != K_local:
        raise FusedSolveUnavailable(
            f"bits-injection mode needs per-shard K={K_local} equal to the "
            f"kernel's padded K={local_solve.K_pad} (the lane-sharded global "
            f"bits array cannot carry phantom columns); choose K so that "
            f"K/nshards is a multiple of the kernel block"
        )

    null_gated = config.sample_null_action

    def per_shard(lead, x0T, *rest):
        if rng_in_kernel:
            idx = jax.lax.axis_index(sample_axis)
            lead = jnp.stack([
                lead[0] + idx.astype(lead.dtype) * local_nblocks, lead[1]
            ])
        if null_gated:
            # only the shard holding global sample 0 injects the null action
            g = (jax.lax.axis_index(sample_axis) == 0).astype(jnp.int32)
            rest = rest + (g.reshape(1),)
        out = local_solve(lead, x0T, *rest)
        delta_l, m_l, s_l, cost_l = out[:4]
        m_g = jax.lax.pmax(m_l, sample_axis)
        corr = jnp.exp(m_l - m_g)
        s_g = jax.lax.psum(s_l * corr, sample_axis)
        delta_g = jax.lax.psum(delta_l * corr, sample_axis)
        res = (delta_g, m_g, s_g, cost_l)
        if emit:
            res = res + (out[4],)
        return res

    lead_spec = P() if rng_in_kernel else P(None, sample_axis)
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(lead_spec, P(None, sample_axis))
        + (P(),) * nargs_after_x0,
        out_specs=(P(), P(), P(), P(sample_axis))
        + ((P(None, sample_axis),) if emit else ()),
        # pallas_call has no varying-manual-axes rule; the collectives above
        # make the replicated outputs genuinely replicated
        check_vma=False,
    )

    def solve(seed_or_bits, x0T, *rest):
        rest = tuple(
            r if jnp.ndim(r) == 2 else jnp.asarray(r, config.dtype)
            for r in rest
        )
        return sharded(seed_or_bits, jnp.asarray(x0T, config.dtype), *rest)

    return solve


def make_sharded_transposed_solve(config, dynamics, running_cost, mesh,
                                  sample_axis: str = "k",
                                  rng_in_kernel: bool = True,
                                  terminal_final=None):
    """K-sharded MPPI fused solve (see :func:`_make_sharded_solve`); same
    call signature as :func:`pallas_rollout.make_transposed_fused_solve`."""
    from . import pallas_rollout as PR

    return _make_sharded_solve(
        config,
        lambda cfg: PR.make_transposed_fused_solve(
            cfg, dynamics, running_cost, rng_in_kernel=rng_in_kernel,
            emit_perturbed=config.fused_artifacts, null_dynamic_gate=True,
            terminal_final=terminal_final,
        ),
        mesh, sample_axis, rng_in_kernel, nargs_after_x0=7,
        emit=config.fused_artifacts,
    )


def make_sharded_smppi_solve(config, dynamics, running_cost, mesh,
                             sample_axis: str = "k",
                             rng_in_kernel: bool = True,
                             terminal_final=None):
    """K-sharded SMPPI fused solve; same call signature as
    :func:`pallas_rollout.make_transposed_smppi_solve` (the rate-space delta
    merges across shards exactly like the plain delta)."""
    from . import pallas_rollout as PR

    return _make_sharded_solve(
        config,
        lambda cfg: PR.make_transposed_smppi_solve(
            cfg, dynamics, running_cost, rng_in_kernel=rng_in_kernel,
            emit_perturbed=config.fused_artifacts, null_dynamic_gate=True,
            terminal_final=terminal_final,
        ),
        mesh, sample_axis, rng_in_kernel, nargs_after_x0=12,
        emit=config.fused_artifacts,
    )


def make_sharded_kmppi_solve(config, dynamics, running_cost, mesh,
                             sample_axis: str = "k",
                             rng_in_kernel: bool = True,
                             terminal_final=None):
    """K-sharded KMPPI fused solve; same call signature as
    :func:`pallas_rollout.make_transposed_kmppi_solve` (the THETA-space delta
    merges across shards exactly like the plain delta)."""
    from . import pallas_rollout as PR

    return _make_sharded_solve(
        config,
        lambda cfg: PR.make_transposed_kmppi_solve(
            cfg, dynamics, running_cost, rng_in_kernel=rng_in_kernel,
            emit_perturbed=config.fused_artifacts, null_dynamic_gate=True,
            terminal_final=terminal_final,
        ),
        mesh, sample_axis, rng_in_kernel, nargs_after_x0=11,
        emit=config.fused_artifacts,
    )


def make_sharded_batched_solve(config, num_envs, dynamics, running_cost,
                               mesh, env_axis: str = "data",
                               rng_in_kernel: bool = True,
                               noise_operand: bool = False,
                               terminal_final=None):
    """The batched (N-plant) fused kernel under ``shard_map`` with plants
    sharded over ``env_axis`` — the pod-scale scenario layout (SURVEY.md
    §3.4).  Unlike the K-sharded solve this needs ZERO collectives: each
    shard's plants run their own per-plant softmax locally, and the
    reference's shared-noise semantics hold globally for free because every
    plant's K-blocks reseed from the block index alone (independent of both
    the plant and the shard).  Same call signature as
    :func:`pallas_rollout.make_transposed_batched_solve`; the per-plant
    outputs come back env-sharded."""
    from jax.sharding import PartitionSpec as P

    from . import pallas_rollout as PR

    nshards = mesh.shape[env_axis]
    if num_envs % nshards:
        raise FusedSolveUnavailable(
            f"num_envs={num_envs} must divide evenly over the {nshards}-way "
            f"{env_axis!r} mesh axis for the sharded batched fused solve"
        )
    N_local = num_envs // nshards
    local_solve = PR.make_transposed_batched_solve(
        config, N_local, dynamics, running_cost, rng_in_kernel=rng_in_kernel,
        noise_operand=noise_operand, terminal_final=terminal_final,
    )

    # the lead operand is replicated across env shards in every sampling
    # mode: an SMEM seed (kernel rng), injected bits, or the one shared
    # (D, K_pad) noise draw (noise_operand) — shared-noise semantics
    # (mppi.py:837-838) hold globally either way
    sharded = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(), P(None, env_axis), P(None, env_axis), P(), P(), P(),
                  P(), P(None, env_axis), P()),
        out_specs=(P(None, env_axis), P(None, env_axis), P(env_axis)),
        check_vma=False,
    )

    def solve(seed_or_bits, x0T, U2T, op, mu_t, lo_t, hi_t, aT, lambda_):
        dt = config.dtype
        return sharded(
            seed_or_bits, jnp.asarray(x0T, dt), jnp.asarray(U2T, dt),
            op if jnp.ndim(op) == 2 else jnp.asarray(op, dt),
            jnp.asarray(mu_t, dt), jnp.asarray(lo_t, dt),
            jnp.asarray(hi_t, dt), jnp.asarray(aT, dt),
            jnp.asarray(lambda_, dt),
        )

    # forward the per-shard kernel's grid/padding/mode so callers (the
    # _one_iteration_fused operand branch pads noise to K_pad) need not
    # re-derive them
    solve.nblocks = local_solve.nblocks
    solve.K_pad = local_solve.K_pad
    solve.block_k = local_solve.block_k
    solve.noise_operand = local_solve.noise_operand
    return solve


def _route_transposed_solve(config, builder, terminal_state_cost,
                            sample_trajectories, specific_dynamics, mesh,
                            variant: str, sharded: bool = False,
                            sharded_desc: str = "K-sharded: per-shard "
                            "kernels + pmax/psum flash-stat collectives"):
    """Shared ``use_pallas`` routing for the transposed fused kernels: checks
    static eligibility + backend, builds the kernel (probing the dynamics'
    batch-last vocabulary), and logs the decision.  Returns the solve or
    None (XLA scan fallback).  With ``sharded``, the builder wraps per-shard
    kernels in shard_map (the mesh itself is then expected; null-action
    injection and fused_artifacts are handled by the per-shard kernels'
    dynamic null gate and K-sharded emit);
    ``sharded_desc`` names the sharding scheme in the success log."""
    from . import batch_last as BL
    from . import pallas_rollout as PR

    if PR._interpret():
        logger.warning(
            "use_pallas: the fused kernel needs the TPU hardware PRNG; using "
            "the XLA scan path on backend %r", jax.default_backend(),
        )
        return None
    if sharded and config.num_elites > 0:
        # the (D, 128) elites operand would need to reach exactly one shard's
        # block 0; not plumbed — K-sharded elite configs use the XLA path
        logger.warning(
            "use_pallas with num_elites on a K-sharded mesh is not supported "
            "by the fused kernels; using the XLA scan path"
        )
        return None
    if (
        config.num_elites > 0
        and not config.fused_artifacts
        and PR.transposed_eligible(
            dataclasses.replace(config, fused_artifacts=True),
            has_terminal=terminal_state_cost is not None,
            has_specific_sampler=(
                sample_trajectories is not None or specific_dynamics is not None
            ),
            mesh=None if sharded else mesh,
        )
    ):
        # the one ineligibility the user can lift with a flag: say so
        logger.warning(
            "use_pallas with num_elites=%d needs fused_artifacts=True (the "
            "top-k elite refresh reads the kernel's materialized perturbed "
            "set); using the XLA scan path — set fused_artifacts=True to "
            "keep the fused kernel (+~3.6 us at K=10k, docs/DESIGN.md §11)",
            config.num_elites,
        )
        return None
    if not PR.transposed_eligible(
        config,
        has_terminal=terminal_state_cost is not None,
        has_specific_sampler=(
            sample_trajectories is not None or specific_dynamics is not None
        ),
        mesh=None if sharded else mesh,
    ):
        logger.warning(
            "use_pallas requested but the %s configuration is ineligible "
            "(terminal cost / specific sampler / elite reuse without "
            "fused_artifacts / M>1 / stochastic / parameterized / non-f32 / "
            "sharded); using the XLA scan path",
            variant,
        )
        return None
    try:
        solve = builder()
    except (BL.UnsupportedPrimitive, FusedSolveUnavailable) as e:
        # NOTE: arbitrary ValueErrors from tracing USER dynamics/cost are
        # deliberately not caught here — those are user bugs and must surface
        logger.warning(
            "use_pallas: fused kernel unavailable for this %s configuration "
            "(%s); using the XLA scan path", variant, e,
        )
        return None
    logger.info(
        "use_pallas: %s routing to the transposed K-on-lanes fused kernel%s "
        "(docs/DESIGN.md §6); its own hardware-PRNG noise stream; %s", variant,
        f" ({sharded_desc})" if sharded else "",
        "noise/perturbed artifacts materialized (fused_artifacts)"
        if config.fused_artifacts
        else "noise/perturbed artifacts are not materialized",
    )
    return solve


def _gate_adaptive_covariance(config: MPPIConfig, use_pallas, variant: str):
    """Validate the adaptive-covariance config and resolve its routing.

    The adaptation consumes the per-iteration noise/omega artifacts, which
    the fused transposed kernels never materialize in HBM (their whole
    point), so ``use_pallas`` falls back to the XLA scan path with a
    warning.  With ``num_iterations=1`` the adapted sigma would never drive
    a sampling step, so the flag is a no-op — warn loudly rather than
    silently accept a config the user probably mistuned.
    """
    if not config.adaptive_covariance:
        return use_pallas
    if not 0.0 < config.adaptive_cov_lr <= 1.0:
        raise ValueError(
            f"adaptive_cov_lr must be in (0, 1], got {config.adaptive_cov_lr}"
        )
    if config.num_iterations < 2:
        logger.warning(
            "adaptive_covariance with num_iterations=1 has no effect: the "
            "covariance adapted after the single update cycle never drives "
            "a sampling step; set num_iterations >= 2"
        )
    if use_pallas:
        logger.warning(
            "adaptive_covariance on %s needs the per-iteration noise/omega "
            "artifacts, which the fused kernels keep out of HBM by design; "
            "using the XLA scan path", variant,
        )
        use_pallas = False
    return use_pallas


def _check_risk_alpha_range(config: MPPIConfig):
    """Shared [0, 1] range validation (one site for the message/bounds;
    used by _gate_risk_alpha and the batched factory, whose M-axis rule
    differs)."""
    if not 0.0 <= config.risk_alpha <= 1.0:
        raise ValueError(
            f"risk_alpha must be in [0, 1], got {config.risk_alpha}"
        )


def _gate_risk_alpha(config: MPPIConfig):
    """Validate risk_alpha at the ops layer (mirrors the controller check at
    controller.py) so a hand-built ``MPPIConfig`` gets the same loud error:
    CVaR aggregation only exists on the M (rollout_samples) axis, so
    ``risk_alpha > 0`` with ``M == 1`` would otherwise be silently ignored
    by ``rollout_costs`` (its ``var_on`` branch is off at M=1)."""
    _check_risk_alpha_range(config)
    if config.risk_alpha > 0.0 and config.M < 2:
        raise ValueError(
            "risk_alpha needs rollout_samples (M) > 1: CVaR over the "
            "stochastic rollouts is undefined with a single rollout"
        )


def _gate_gradient_refinement(config: MPPIConfig, variant: str):
    """Validate the gradient-refinement config (cf. ``make_nominal_refiner``).
    MPPI refines its nominal U directly; SMPPI/KMPPI sample in lifted spaces
    (action rates / kernel support points) where a bound-projected descent on
    U would bypass their structure, and MPPI_Batched shares one solve across
    plants — all three reject the flag loudly instead of silently ignoring it."""
    if config.gradient_refinement_steps == 0:
        return
    if config.gradient_refinement_steps < 0:
        raise ValueError(
            "gradient_refinement_steps must be >= 0, got "
            f"{config.gradient_refinement_steps}"
        )
    if not (config.gradient_refinement_lr > 0.0 and
            math.isfinite(config.gradient_refinement_lr)):
        raise ValueError(
            "gradient_refinement_lr must be a positive finite float, got "
            f"{config.gradient_refinement_lr}"
        )
    if variant != "MPPI":
        raise ValueError(
            f"gradient_refinement_steps is only supported on MPPI, not "
            f"{variant}: SMPPI/KMPPI sample in lifted spaces (rates / support "
            f"points) and MPPI_Batched shares one solve across plants; use "
            f"plain MPPI controllers if you need the gradient stage"
        )


def _gate_elites(config: MPPIConfig, variant: str, has_sampler: bool = True):
    """Validate elite reuse (``MPPIConfig.num_elites``, iCEM-style) at the ops
    layer.  MPPI re-injects elites directly as action-space sample rows;
    SMPPI/KMPPI sample in lifted spaces (action rates / kernel support points)
    where an action-space elite has no row to occupy, and MPPI_Batched shares
    one sample set across plants — all three reject the flag loudly instead
    of silently ignoring it.  ``has_sampler`` mirrors the injection itself:
    ``num_specific_trajectories`` rows only exist when a sampler is actually
    wired (inject_specific_actions skips them otherwise), so an unwired count
    must not spuriously reject a valid config."""
    if config.num_elites == 0:
        return
    if config.num_elites < 0:
        raise ValueError(f"num_elites must be >= 0, got {config.num_elites}")
    if variant != "MPPI":
        raise ValueError(
            f"num_elites is only supported on MPPI, not {variant}: SMPPI/"
            f"KMPPI sample in lifted spaces (rates / support points) with no "
            f"action-space rows to re-inject, and MPPI_Batched shares one "
            f"sample set across plants; use plain MPPI controllers for "
            f"elite reuse"
        )
    injected = (
        config.num_elites
        + (1 if config.sample_null_action else 0)
        + (config.num_specific_trajectories if has_sampler else 0)
    )
    if injected >= config.K:
        raise ValueError(
            f"num_elites={config.num_elites} plus the other injected rows "
            f"(null action + specific trajectories = {injected - config.num_elites}) "
            f"fills all K={config.K} samples; leave room for fresh noise rows"
        )


def make_nominal_refiner(
    config: MPPIConfig,
    dynamics: Callable,  # already wrapped (see wrap_dynamics)
    running_cost: Callable,  # already wrapped (see wrap_cost)
    terminal_state_cost: Optional[Callable],
    specific_dynamics: Optional[Callable],
    terminal_final_cost: Optional[Callable] = None,  # already wrapped
) -> Callable:
    """Projected-Adam descent of the nominal sequence on the task cost
    (gradient-accelerated MPPI; cf. the Gauss-Newton MPPI line of work,
    arXiv:2512.04579 — net-new vs the reference, which never differentiates
    through its rollout).

    ``J(U)`` is exactly what :func:`rollout_costs` computes for the single
    trajectory ``U`` (running + terminal cost, M-averaged with variance /
    CVaR terms under stochastic dynamics) — so the gradient stage optimizes
    the same objective the sampling stage weighted, minus the perturbation
    cost, which is identically zero at the nominal (noise = 0).  Each step
    projects back into ``[u_min, u_max]`` (the reference never re-clamps
    U after its omega update; the *refined* U respects bounds by
    construction, which only strengthens the contract for opt-in users).
    Under ``stochastic_dynamics`` the key is held fixed across the descent
    (common random numbers), so the gradient walks one consistent sample of
    the dynamics noise rather than chasing a re-randomized objective.

    Differentiation runs through the same ``lax.scan`` rollout the solve
    uses: XLA fuses the forward and reverse passes per step, so one
    refinement step costs roughly three K=1 rollouts — negligible next to
    the K-sample stage for any production K.
    """
    steps = config.gradient_refinement_steps
    dtype = config.dtype
    b1, b2, eps = 0.9, 0.999, 1e-8

    def refine(params: MPPIParams, U: jax.Array, x0, key, dyn_params=None):
        lr = jnp.asarray(config.gradient_refinement_lr, dtype)
        lo = jnp.broadcast_to(params.u_min, (config.nu,)).astype(dtype)
        hi = jnp.broadcast_to(params.u_max, (config.nu,)).astype(dtype)
        # one rollout per start state when x0 is a (K, nx) batch (the solve
        # accepts per-sample starts, mppi.py:302-305): J averages over them
        Kx = x0.shape[0] if x0.ndim == 2 else 1

        def J(U_):
            pert = jnp.broadcast_to(U_[None], (Kx,) + U_.shape)
            cost_total, _, _ = rollout_costs(
                config, dynamics, running_cost, terminal_state_cost,
                specific_dynamics, params, x0, pert, key,
                dyn_params=dyn_params, terminal_final_cost=terminal_final_cost,
            )
            return jnp.mean(cost_total)

        grad_J = jax.grad(J)

        def body(i, carry):
            U_, m, v = carry
            g = grad_J(U_)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * jnp.square(g)
            t = jnp.asarray(i + 1, dtype)
            m_hat = m / (1 - jnp.power(jnp.asarray(b1, dtype), t))
            v_hat = v / (1 - jnp.power(jnp.asarray(b2, dtype), t))
            U_ = U_ - lr * m_hat / (jnp.sqrt(v_hat) + jnp.asarray(eps, dtype))
            return _bound(U_, lo, hi), m, v

        zeros = jnp.zeros_like(U)
        U_ref, _, _ = lax.fori_loop(0, steps, body, (U, zeros, zeros))
        return U_ref

    return refine


def _select_action(config: MPPIConfig, seq: jax.Array) -> jax.Array:
    """Return the first u_per_command actions, squeezed if 1 (mppi.py:271-275)."""
    action = seq[: config.u_per_command]
    if config.u_per_command == 1:
        action = action[0]
    return action


def _shift_U(U: jax.Array, u_init: jax.Array) -> jax.Array:
    """Roll the nominal sequence forward one step (mppi.py:232-238)."""
    return jnp.roll(U, -1, axis=0).at[-1].set(u_init)


def _shift_elites(elites: jax.Array, u_init: jax.Array) -> jax.Array:
    """Time-shift the stored elite trajectories like the nominal sequence:
    the plan found for [t, t+T) becomes a candidate for [t+1, t+T+1)."""
    return jnp.roll(elites, -1, axis=1).at[:, -1].set(u_init)


def make_mppi_step(
    config: MPPIConfig,
    dynamics: Callable,
    running_cost: Callable,
    terminal_state_cost: Optional[Callable] = None,
    sample_trajectories: Optional[Callable] = None,
    specific_dynamics: Optional[Callable] = None,
    jit: bool = True,
    mesh=None,
    sample_axis: str = "k",
    use_pallas: bool = False,
    terminal_final_cost: Optional[Callable] = None,
) -> StepFns:
    """Build the jitted MPPI solve for one static configuration.

    The returned ``step`` implements the full ``command()`` call stack
    (SURVEY.md §3.1) as a single traced program.

    With ``mesh``, the K sample axis is sharded over ``sample_axis``: noise
    generation, rollout and costs stay fully sharded; XLA inserts the three small
    collectives the weighting needs (min, sum, weighted-noise psum) over ICI.
    Thanks to partitionable threefry the results are bit-identical to the
    single-device solve.

    With ``use_pallas`` (and an eligible config — M=1, no terminal cost/sampler,
    deterministic f32, unsharded), the whole iteration runs as ONE transposed
    K-on-lanes Pallas kernel (in-kernel hardware PRNG through the
    flash-softmax update; arbitrary traceable dynamics via batch-axis-last
    jaxpr evaluation).  Measured on v5e (docs/DESIGN.md §6): ~1.04x the XLA
    path at the flagship shape and ~1.6x for MLP dynamics.  It stays opt-in
    because it trades surface for speed: its hardware-PRNG noise stream is
    TPU-only (no CPU-reproducible stream) and the noise/perturbed-action
    artifacts are never materialized in HBM, so those fields are None.
    ``use_pallas="rollout"`` selects the legacy round-1 kernels (fused
    rollout + streaming weighted update) kept for the decision record.
    Ineligible configs fall back to the XLA scan path with a warning.
    """
    if config.num_iterations < 1:
        raise ValueError(
            f"config.num_iterations must be >= 1, got {config.num_iterations} "
            f"(0 would leave the solve with no update at all)"
        )
    use_pallas = _gate_adaptive_covariance(config, use_pallas, "MPPI")
    _gate_risk_alpha(config)
    _gate_gradient_refinement(config, "MPPI")
    _gate_elites(config, "MPPI",
                 has_sampler=sample_trajectories is not None)
    _gate_terminal(terminal_state_cost, terminal_final_cost)
    # rows excluded from the adaptive-covariance rank-mu estimate: the null
    # action, sampler-injected trajectories and re-injected elites are not
    # sampling-noise draws
    n_injected_rows = (
        (1 if config.sample_null_action else 0)
        + (config.num_specific_trajectories if sample_trajectories is not None else 0)
        + config.num_elites
    )
    dyn = wrap_dynamics(config, dynamics)
    cost = wrap_cost(config, running_cost)
    final_cost = (
        wrap_final_cost(terminal_final_cost)
        if terminal_final_cost is not None else None
    )
    dtype = config.dtype
    cset = make_constrainer(mesh)

    fused_rollout = None
    transposed_solve = None
    if use_pallas:
        from . import pallas_rollout as PR

        if use_pallas == "rollout":
            # legacy round-1 kernels: null-action/specific *sampling* only
            # edits perturbed actions before the kernel and does not affect
            # eligibility; the per-step specific_dynamics hook and
            # terminal-cost storage do.
            if mesh is None and PR.pallas_eligible(
                config,
                has_terminal=(terminal_state_cost is not None
                              or terminal_final_cost is not None),
                has_specific=specific_dynamics is not None,
            ):
                fused_rollout = PR.make_fused_rollout(config, dyn, cost)
                logger.warning(
                    "use_pallas='rollout' selects the round-1 K-on-sublanes "
                    "kernels, measured ~10x slower than the XLA path at the "
                    "flagship shape (docs/DESIGN.md §6) — kept for the "
                    "decision record only"
                )
            else:
                logger.warning(
                    "use_pallas='rollout' requested but the configuration is "
                    "ineligible (terminal cost / specific dynamics / M>1 / "
                    "stochastic / non-f32 / sharded); using the XLA scan path"
                )
        elif mesh is not None:
            # K-sharded fused path: per-shard kernels + the three flash-stat
            # collectives (pmax/psum) over ICI
            transposed_solve = _route_transposed_solve(
                config,
                lambda: make_sharded_transposed_solve(
                    config, dyn, cost, mesh, sample_axis,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "MPPI", sharded=True,
            )
        else:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: PR.make_transposed_fused_solve(
                    config, dyn, cost,
                    emit_perturbed=config.fused_artifacts,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "MPPI",
            )

    K, T, nu = config.K, config.T, config.nu
    D = T * nu

    # opt-in gradient polish of the nominal after the sampling stage; plain
    # XLA autodiff, so it composes with every route above (incl. the fused
    # kernels — refinement runs on their returned U)
    refine_nominal = (
        make_nominal_refiner(
            config, dyn, cost, terminal_state_cost, specific_dynamics,
            terminal_final_cost=final_cost,
        )
        if config.gradient_refinement_steps > 0
        else None
    )

    def _solve(params: MPPIParams, state: MPPIState, x0, info, shift: bool, dyn_params=None):
        U = state.U
        elites = state.elites
        if config.num_elites > 0 and elites is None:
            # structural (pytree) property — resolves at trace time; without
            # this, shift crashes with an opaque roll-of-None TypeError and
            # no-shift silently skips injection while n_injected_rows still
            # masks rows out of the adaptive-covariance estimate
            raise ValueError(
                f"config.num_elites={config.num_elites} but state.elites is "
                f"None: seed MPPIState.elites with (num_elites, T, nu) "
                f"trajectories (e.g. broadcast copies of the nominal, as "
                f"MPPI._initial_elites does)"
            )
        if shift:
            U = _shift_U(U, params.u_init)
            if config.num_elites > 0:
                # the elite plans advance one step with the receding horizon
                elites = _shift_elites(elites, params.u_init)
        key = state.key

        x0 = jnp.asarray(x0, dtype)

        # optimization iterations per command (config.num_iterations, default 1):
        # re-center the sampling distribution on the updated nominal sequence and
        # repeat the whole sample->rollout->weight->update cycle — all inside the
        # same traced program (MPPI-Generic's num_iters, arXiv:2409.07563).
        # With adaptive_covariance the sampling sigma is threaded through the
        # iterations (MPOPI-style rank-mu re-estimation, see adapt_covariance)
        # and resets to params.noise_sigma at the next command.
        sigma = params.noise_sigma
        for it in range(config.num_iterations):
            key, k_noise, k_roll = jax.random.split(key, 3)
            it_params = (
                params._replace(noise_sigma=sigma)
                if config.adaptive_covariance else params
            )
            U, artifacts, elites = _one_iteration(
                it_params, U, elites, x0, info, k_noise, k_roll, dyn_params
            )
            if config.adaptive_covariance and it + 1 < config.num_iterations:
                sigma = adapt_covariance(
                    config, sigma, artifacts.omega, artifacts.noise,
                    n_injected=n_injected_rows,
                )

        if refine_nominal is not None:
            # gradient polish of the sampled optimum (make_nominal_refiner);
            # the key split only happens on this opt-in path, so steps=0
            # solves keep a bit-identical key stream
            if config.stochastic_dynamics:
                key, k_ref = jax.random.split(key)
            else:
                k_ref = key  # unused by a deterministic rollout
            U = refine_nominal(params, U, x0, k_ref, dyn_params)

        action = _select_action(config, U)
        return MPPIState(U=U, key=key, elites=elites), action, artifacts

    def _one_iteration_fused(params, U, elites, x0, k_noise):
        """The whole iteration as one transposed-layout kernel call: derive
        the tiny per-solve operands in XLA (cholesky, mixing operator, action
        cost vector — all O(D^2) at most), then sample/rollout/weight/update
        entirely in VMEM.  With elite reuse the shifted elites ride a
        (D, 128) operand with columns at their global sample indices (after
        the null row); the kernel overwrites those block-0 columns before
        the clamp — identical ordering to inject_specific_actions."""
        from . import pallas_rollout as PR

        sigma_inv, op, mu_t, lo2, hi2 = _transposed_operands(
            params.noise_sigma, params.noise_mu, params.u_min, params.u_max,
            config, T, nu, dtype,
        )
        a_flat = (params.lambda_ * (U @ sigma_inv.T)).reshape(D)
        x0T = _x0_to_lanes(x0, K)
        seed = PR.key_to_seed(k_noise)
        elites_in = ()
        if config.num_elites > 0:
            off = 1 if config.sample_null_action else 0
            el2 = elites.astype(dtype).reshape(config.num_elites, D).T  # (D, E)
            elites_in = (jnp.zeros((D, 128), dtype)
                         .at[:, off:off + config.num_elites].set(el2),)
        out = transposed_solve(
            seed, x0T, U.reshape(D), op, mu_t, lo2, hi2, a_flat,
            params.lambda_, *elites_in,
        )
        delta, m, s, cost_total = out[:4]
        ctnz, omega = PR.weighting_from_stats(cost_total, params.lambda_, m, s)
        U_new = U + (delta / s).reshape(T, nu)
        new_elites = elites
        if config.num_elites > 0:
            # top-k refresh straight off the kernel's (D, K) perturbed output:
            # a 4-column lane gather, NOT the full (D, K) -> (K, T, nu)
            # transpose+relayout the artifact surface pays (XLA dead-codes
            # that when nothing reads the artifacts)
            _, eidx = lax.top_k(-cost_total, config.num_elites)
            new_elites = out[4][:, eidx].T.reshape(config.num_elites, T, nu)
        noise_art = pert_art = None
        if config.fused_artifacts:
            # perturbed comes back (D, K); the rectified noise is the same
            # subtraction the kernel's update used, so it is bit-exact
            perturbed2 = out[4].T
            noise_art = (perturbed2 - U.reshape(D)[None]).reshape(K, T, nu)
            pert_art = perturbed2.reshape(K, T, nu)
        artifacts = Artifacts(
            cost_total=cost_total,
            cost_total_non_zero=ctnz,
            omega=omega,
            noise=noise_art,
            perturbed_action=pert_art,
            states=None,
            actions=None,
        )
        return U_new, artifacts, new_elites

    def _one_iteration(params, U, elites, x0, info, k_noise, k_roll, dyn_params):
        if transposed_solve is not None:
            # with num_elites > 0 the route guarantees fused_artifacts, so
            # the refresh in _solve reads the kernel's materialized
            # perturbed set
            return _one_iteration_fused(params, U, elites, x0, k_noise)
        # The sampling/bounding/weighting pipeline runs in flat (K, T·nu) 2-D
        # layout: TPU tiles the two minor dims (8, 128), so a (K, T, nu) tensor
        # with nu=2 lane-pads 64x on every elementwise pass.  Lane-dense flat
        # rows make noise gen + clamp + action cost ~2.3x faster end-to-end at
        # K=10k, T=30.  Reshapes to (K, T, nu) below are row-major views, so
        # results are bit-identical to the 3-D formulation.
        chol, sigma_inv = _sigma_factors(params.noise_sigma, diag=config.diag_sigma)
        noise2 = sample_noise_flat(
            k_noise, K, T, params, dtype, antithetic=config.antithetic, chol=chol,
            noise_rho=config.noise_rho, diag_sigma=config.diag_sigma,
        )
        noise2 = cset(noise2, sample_axis)
        U2 = U.reshape(D)
        perturbed2 = U2[None] + noise2
        if sample_trajectories is not None and config.num_specific_trajectories > 0:
            # sampler rows need the (K, T, nu) contract; null/elites ride along
            perturbed = inject_specific_actions(
                config, sample_trajectories, perturbed2.reshape(K, T, nu), x0, info,
                elites=elites,
            )
            perturbed2 = perturbed.reshape(K, D)
        else:
            # null-action + elite rows injected in the FLAT lane-dense layout
            # (same row order as inject_specific_actions): a row-0 set and an
            # E-row dynamic_update_slice on (K, D) — no (K, T, nu) round trip,
            # whose nu-wide lanes relayout the whole 2.4 MB tensor (measured
            # +130 us at the flagship shape, benchmarks/elite_modes.py)
            if config.sample_null_action:
                perturbed2 = perturbed2.at[0].set(0.0)
            if config.num_elites > 0:
                perturbed2 = lax.dynamic_update_slice(
                    perturbed2,
                    elites.astype(dtype).reshape(config.num_elites, D),
                    (1 if config.sample_null_action else 0, 0),
                )
        lo2 = jnp.tile(jnp.broadcast_to(params.u_min, (nu,)).astype(dtype), T)
        hi2 = jnp.tile(jnp.broadcast_to(params.u_max, (nu,)).astype(dtype), T)
        perturbed2 = _bound(perturbed2, lo2, hi2)
        # rectified-Gaussian noise: recompute after clamping so truncated noise is
        # not penalized in the action cost (mppi.py:383-385)
        noise2 = perturbed2 - U2[None]

        # action perturbation cost folded to one matvec:
        # sum_{t,n} U λ (noise Σ⁻¹) == noise_flat @ (λ Σ⁻¹ U)_flat (mppi.py:407-417)
        a_flat = (params.lambda_ * (U @ sigma_inv.T)).reshape(D)
        n_for_cost = jnp.abs(noise2) if config.noise_abs_cost else noise2
        perturbation_cost = n_for_cost @ a_flat

        perturbed = perturbed2.reshape(K, T, nu)
        if fused_rollout is not None:
            x0_K = x0 if x0.ndim == 2 else jnp.broadcast_to(
                x0[None, :], (config.K, x0.shape[-1])
            )
            rollout_cost = fused_rollout(
                x0_K, perturbed * jnp.asarray(config.u_scale, dtype)
            )
            states = actions = None
        else:
            rollout_cost, states, actions = rollout_costs(
                config, dyn, cost, terminal_state_cost, specific_dynamics,
                params, x0, perturbed, k_roll, dyn_params=dyn_params,
                terminal_final_cost=final_cost,
            )
        cost_total = cset(rollout_cost + perturbation_cost, sample_axis)

        if fused_rollout is not None:
            from . import pallas_rollout as PR

            pert_flat, m, s = PR.fused_weighted_update(
                cost_total, noise2, params.lambda_
            )
            perturbations = (pert_flat / s).reshape(T, nu)
            cost_total_non_zero, omega = PR.weighting_from_stats(
                cost_total, params.lambda_, m, s
            )
        else:
            cost_total_non_zero, omega = compute_weighting(cost_total, params.lambda_)
            # weighted noise reduction == (K,)·(K, T·nu) matmul on the MXU (mppi.py:268-270)
            perturbations = (omega @ noise2).reshape(T, nu)
        U_new = U + perturbations

        new_elites = elites
        if config.num_elites > 0:
            # iCEM-style elite refresh on the FLAT perturbed rows (injected
            # elites compete with the fresh noise rows and survive only on
            # merit); a lane-dense row gather, not a (K, T, nu) gather
            _, eidx = lax.top_k(-cost_total, config.num_elites)
            new_elites = perturbed2[eidx].reshape(config.num_elites, T, nu)

        artifacts = Artifacts(
            cost_total=cost_total,
            cost_total_non_zero=cost_total_non_zero,
            omega=omega,
            noise=noise2.reshape(K, T, nu),
            perturbed_action=perturbed,
            states=states,
            actions=None if actions is None else actions / jnp.asarray(config.u_scale, dtype),
        )
        return U_new, artifacts, new_elites

    def step(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=True, dyn_params=dyn_params)

    def step_no_shift(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=False, dyn_params=dyn_params)

    get_rollouts = make_get_rollouts(config, dyn)

    if jit:
        step = jax.jit(step)
        step_no_shift = jax.jit(step_no_shift)
    return StepFns(step=step, step_no_shift=step_no_shift, get_rollouts=get_rollouts)


def make_get_rollouts(config: MPPIConfig, wrapped_dynamics: Callable) -> Callable:
    """Roll the nominal sequence from given initial states (mppi.py:425-448)."""
    dtype = config.dtype

    @functools.partial(jax.jit, static_argnames=("num_rollouts",))
    def get_rollouts(params: MPPIParams, x0, U, key=None, num_rollouts: int = 1,
                     dyn_params=None):
        x0 = jnp.asarray(x0, dtype).reshape(-1, config.nx)
        if x0.shape[0] == 1:
            x0 = jnp.broadcast_to(x0, (num_rollouts, config.nx))
        T = U.shape[0]
        step_keys = (
            jax.random.split(key, T)
            if (config.stochastic_dynamics and key is not None)
            else jnp.zeros((T, 1), dtype=jnp.uint32)
        )

        def body(state, inp):
            u_t, t, k_t = inp
            u = jnp.broadcast_to(u_t[None], (x0.shape[0], config.nu)) * jnp.asarray(
                config.u_scale, dtype
            )
            nxt = wrapped_dynamics(dyn_params, state, u, t, k_t)
            nxt = nxt[..., : config.nx]
            return nxt, nxt

        _, states = lax.scan(body, x0, (U, jnp.arange(T), step_keys),
                             unroll=config.scan_unroll)
        return jnp.swapaxes(states, 0, 1)  # (R, T, nx)

    return get_rollouts


# ---------------------------------------------------------------------------
# Step factory — SMPPI (reference mppi.py:451-570, arXiv:2112.09988)
# ---------------------------------------------------------------------------


def make_smppi_step(
    config: MPPIConfig,
    dynamics: Callable,
    running_cost: Callable,
    terminal_state_cost: Optional[Callable] = None,
    sample_trajectories: Optional[Callable] = None,
    specific_dynamics: Optional[Callable] = None,
    jit: bool = True,
    mesh=None,
    sample_axis: str = "k",
    use_pallas: bool = False,
    terminal_final_cost: Optional[Callable] = None,
) -> StepFns:
    if config.num_iterations < 1:
        raise ValueError(
            f"config.num_iterations must be >= 1, got {config.num_iterations}"
        )
    # within-command covariance adaptation operates on the rate-space noise
    # ensemble (the space SMPPI samples in), same estimator as base MPPI
    use_pallas = _gate_adaptive_covariance(config, use_pallas, "SMPPI")
    _gate_risk_alpha(config)
    _gate_gradient_refinement(config, "SMPPI")
    _gate_elites(config, "SMPPI")
    _gate_terminal(terminal_state_cost, terminal_final_cost)
    # rows excluded from the adaptive-covariance rank-mu estimate: the null
    # action and sampler-injected trajectories are not sampling-noise draws
    n_injected_rows = (1 if config.sample_null_action else 0) + (
        config.num_specific_trajectories if sample_trajectories is not None else 0
    )
    dyn = wrap_dynamics(config, dynamics)
    cost = wrap_cost(config, running_cost)
    final_cost = (
        wrap_final_cost(terminal_final_cost)
        if terminal_final_cost is not None else None
    )
    dtype = config.dtype
    cset = make_constrainer(mesh)

    K, T, nu = config.K, config.T, config.nu
    D = T * nu

    transposed_solve = None
    if use_pallas:
        from . import pallas_rollout as PR

        if mesh is not None:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: make_sharded_smppi_solve(
                    config, dyn, cost, mesh, sample_axis,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "SMPPI", sharded=True,
            )
        else:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: PR.make_transposed_smppi_solve(
                    config, dyn, cost,
                    emit_perturbed=config.fused_artifacts,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "SMPPI",
            )

    def _solve(params: SMPPIParams, state: SMPPIState, x0, info, shift: bool, dyn_params=None):
        base = params.base
        U, action_sequence = state.U, state.action_sequence
        if shift:
            # roll both sequences; duplicate the last commanded action (mppi.py:489-493)
            U = _shift_U(U, base.u_init)
            action_sequence = jnp.roll(action_sequence, -1, axis=0)
            action_sequence = action_sequence.at[-1].set(action_sequence[-2])
        key = state.key
        x0 = jnp.asarray(x0, dtype)

        # optimization iterations per command (see make_mppi_step): each cycle
        # re-centers the rate-space sampling on the updated lifted sequence U;
        # the commanded action_sequence stays the integration BASE throughout
        # and is integrated once with the final U, preserving the reference's
        # update-then-integrate order (mppi.py:529-531) at num_iterations=1.
        # adaptive_covariance threads the rate-space sigma across iterations
        # (adapt_covariance), resetting to params.base.noise_sigma per command.
        sigma = params.base.noise_sigma
        for it in range(config.num_iterations):
            key, k_noise, k_roll = jax.random.split(key, 3)
            it_params = (
                params._replace(base=params.base._replace(noise_sigma=sigma))
                if config.adaptive_covariance else params
            )
            U, artifacts = _one_iteration(
                it_params, U, action_sequence, x0, info, k_noise, k_roll, dyn_params
            )
            if config.adaptive_covariance and it + 1 < config.num_iterations:
                sigma = adapt_covariance(
                    config, sigma, artifacts.omega, artifacts.noise,
                    n_injected=n_injected_rows,
                )

        # integrate the lifted control (mppi.py:529-531)
        action_sequence_new = action_sequence + U * params.delta_t
        action = _select_action(config, action_sequence_new)
        new_state = SMPPIState(U=U, action_sequence=action_sequence_new, key=key)
        return new_state, action, artifacts

    def _one_iteration_fused(params, U, action_sequence, x0, k_noise):
        """The whole SMPPI iteration as one transposed-kernel call (see
        make_mppi_step._one_iteration_fused)."""
        from . import pallas_rollout as PR

        base = params.base
        sigma_inv, op, mu_t, lo2, hi2 = _transposed_operands(
            base.noise_sigma, base.noise_mu, base.u_min, base.u_max,
            config, T, nu, dtype,
        )
        alo2 = jnp.tile(jnp.broadcast_to(params.action_min, (nu,)).astype(dtype), T)
        ahi2 = jnp.tile(jnp.broadcast_to(params.action_max, (nu,)).astype(dtype), T)
        a_flat = (base.lambda_ * (U @ sigma_inv.T)).reshape(D)
        x0T = _x0_to_lanes(x0, K)
        seed = PR.key_to_seed(k_noise)
        out = transposed_solve(
            seed, x0T, U.reshape(D), action_sequence.reshape(D), op, mu_t,
            lo2, hi2, alo2, ahi2, a_flat, base.lambda_,
            params.w_action_seq_cost, params.delta_t,
        )
        delta, m, s, cost_total = out[:4]
        ctnz, omega = PR.weighting_from_stats(cost_total, base.lambda_, m, s)
        U_new = U + (delta / s).reshape(T, nu)
        noise_art = pert_art = None
        if config.fused_artifacts:
            # action-space perturbed sequences come back (D, K); the
            # rate-space effective noise is the kernel's own back-computation
            # through both clamps (mppi.py:552), re-applied here bit-exactly
            pa2 = out[4].T
            noise_art = (
                (pa2 - action_sequence.reshape(D)[None]) / params.delta_t
                - U.reshape(D)[None]
            ).reshape(K, T, nu)
            pert_art = pa2.reshape(K, T, nu)
        artifacts = Artifacts(
            cost_total=cost_total, cost_total_non_zero=ctnz, omega=omega,
            noise=noise_art, perturbed_action=pert_art, states=None,
            actions=None,
        )
        return U_new, artifacts

    def _one_iteration(params, U, action_sequence, x0, info, k_noise, k_roll, dyn_params):
        if transposed_solve is not None:
            return _one_iteration_fused(params, U, action_sequence, x0, k_noise)
        base = params.base
        # flat (K, T·nu) lane-dense layout throughout (see make_mppi_step);
        # noise lives in action-*rate* space (mppi.py:539-552)
        chol, sigma_inv = _sigma_factors(base.noise_sigma, diag=config.diag_sigma)
        noise2 = sample_noise_flat(
            k_noise, K, T, base, dtype, antithetic=config.antithetic, chol=chol,
            noise_rho=config.noise_rho, diag_sigma=config.diag_sigma,
        )
        noise2 = cset(noise2, sample_axis)
        U2 = U.reshape(D)
        as2 = action_sequence.reshape(D)
        lo2 = jnp.tile(jnp.broadcast_to(base.u_min, (nu,)).astype(dtype), T)
        hi2 = jnp.tile(jnp.broadcast_to(base.u_max, (nu,)).astype(dtype), T)
        alo2 = jnp.tile(jnp.broadcast_to(params.action_min, (nu,)).astype(dtype), T)
        ahi2 = jnp.tile(jnp.broadcast_to(params.action_max, (nu,)).astype(dtype), T)
        perturbed_control2 = _bound(U2[None] + noise2, lo2, hi2)
        perturbed_action2 = as2[None] + perturbed_control2 * params.delta_t
        if config.sample_null_action or (
            sample_trajectories is not None and config.num_specific_trajectories > 0
        ):
            pa = inject_specific_actions(
                config, sample_trajectories, perturbed_action2.reshape(K, T, nu),
                x0, info,
            )
            perturbed_action2 = pa.reshape(K, D)
        perturbed_action2 = _bound(perturbed_action2, alo2, ahi2)
        # effective noise back-computed through both clamps (mppi.py:552)
        noise2 = (perturbed_action2 - as2[None]) / params.delta_t - U2[None]

        a_flat = (base.lambda_ * (U @ sigma_inv.T)).reshape(D)
        n_for_cost = jnp.abs(noise2) if config.noise_abs_cost else noise2
        perturbation_cost = n_for_cost @ a_flat

        # smoothness cost w * sum ||u_scale * diff(actions)||^2 (mppi.py:558-562):
        # time-diff == lane shift by nu in the flat layout
        action_diff = jnp.asarray(config.u_scale, dtype) * (
            perturbed_action2[:, nu:] - perturbed_action2[:, :-nu]
        )
        smoothness = params.w_action_seq_cost * jnp.sum(
            jnp.square(action_diff), axis=1
        )

        perturbed_action = perturbed_action2.reshape(K, T, nu)
        rollout_cost, states, actions = rollout_costs(
            config, dyn, cost, terminal_state_cost, specific_dynamics,
            base, x0, perturbed_action, k_roll, dyn_params=dyn_params,
            terminal_final_cost=final_cost,
        )
        cost_total = cset(rollout_cost + perturbation_cost + smoothness, sample_axis)

        cost_total_non_zero, omega = compute_weighting(cost_total, base.lambda_)
        perturbations = (omega @ noise2).reshape(T, nu)
        U_new = U + perturbations

        artifacts = Artifacts(
            cost_total=cost_total,
            cost_total_non_zero=cost_total_non_zero,
            omega=omega,
            noise=noise2.reshape(K, T, nu),
            perturbed_action=perturbed_action,
            states=states,
            actions=None if actions is None else actions / jnp.asarray(config.u_scale, dtype),
        )
        return U_new, artifacts

    def step(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=True, dyn_params=dyn_params)

    def step_no_shift(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=False, dyn_params=dyn_params)

    get_rollouts = make_get_rollouts(config, dyn)

    if jit:
        step = jax.jit(step)
        step_no_shift = jax.jit(step_no_shift)
    return StepFns(step=step, step_no_shift=step_no_shift, get_rollouts=get_rollouts)


# ---------------------------------------------------------------------------
# Step factory — KMPPI (reference mppi.py:593-688)
# ---------------------------------------------------------------------------


def make_kmppi_step(
    config: MPPIConfig,
    dynamics: Callable,
    running_cost: Callable,
    terminal_state_cost: Optional[Callable] = None,
    sample_trajectories: Optional[Callable] = None,
    specific_dynamics: Optional[Callable] = None,
    jit: bool = True,
    mesh=None,
    sample_axis: str = "k",
    use_pallas: bool = False,
    terminal_final_cost: Optional[Callable] = None,
) -> StepFns:
    if config.num_iterations < 1:
        raise ValueError(
            f"config.num_iterations must be >= 1, got {config.num_iterations}"
        )
    use_pallas = _gate_adaptive_covariance(config, use_pallas, "KMPPI")
    _gate_risk_alpha(config)
    _gate_gradient_refinement(config, "KMPPI")
    _gate_elites(config, "KMPPI")
    _gate_terminal(terminal_state_cost, terminal_final_cost)
    # rows excluded from the adaptive-covariance rank-mu estimate: the null
    # action and sampler-injected trajectories are not sampling-noise draws
    n_injected_rows = (1 if config.sample_null_action else 0) + (
        config.num_specific_trajectories if sample_trajectories is not None else 0
    )
    dyn = wrap_dynamics(config, dynamics)
    cost = wrap_cost(config, running_cost)
    final_cost = (
        wrap_final_cost(terminal_final_cost)
        if terminal_final_cost is not None else None
    )
    dtype = config.dtype
    nsp = config.num_support_pts
    cset = make_constrainer(mesh)

    K, T, nu = config.K, config.T, config.nu
    D, Dp = T * nu, nsp * nu

    transposed_solve = None
    if use_pallas:
        from . import pallas_rollout as PR

        if mesh is not None:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: make_sharded_kmppi_solve(
                    config, dyn, cost, mesh, sample_axis,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "KMPPI", sharded=True,
            )
        else:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: PR.make_transposed_kmppi_solve(
                    config, dyn, cost,
                    emit_perturbed=config.fused_artifacts,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, sample_trajectories, specific_dynamics,
                mesh, "KMPPI",
            )

    def _solve(params: KMPPIParams, state: KMPPIState, x0, info, shift: bool, dyn_params=None):
        base = params.base
        U, theta = state.U, state.theta
        if shift:
            U = _shift_U(U, base.u_init)
            # theta <- interpolate theta at Tk+1 (mppi.py:617-619), precomputed operator
            theta = params.interp_shift @ theta
        key = state.key
        x0 = jnp.asarray(x0, dtype)

        # optimization iterations per command (see make_mppi_step): each cycle
        # re-centers the control-point sampling on the updated theta and
        # re-deparameterizes U — all inside the same traced program.
        # adaptive_covariance adapts in THETA space (the space KMPPI samples
        # in, mppi.py:657-664) from the rectified support-point noise.
        sigma = params.base.noise_sigma
        for it in range(config.num_iterations):
            key, k_noise, k_roll = jax.random.split(key, 3)
            it_params = (
                params._replace(base=params.base._replace(noise_sigma=sigma))
                if config.adaptive_covariance else params
            )
            U, theta, artifacts, noise_theta = _one_iteration(
                it_params, U, theta, x0, info, k_noise, k_roll, dyn_params
            )
            if config.adaptive_covariance and it + 1 < config.num_iterations:
                sigma = adapt_covariance(
                    config, sigma, artifacts.omega,
                    noise_theta.reshape(K, nsp, nu),
                    n_injected=n_injected_rows,
                )

        action = _select_action(config, U)
        return KMPPIState(U=U, theta=theta, key=key), action, artifacts

    def _one_iteration_fused(params, U, theta, x0, k_noise):
        """The whole KMPPI iteration as one transposed-kernel call: noise at
        support points, in-kernel kernel interpolation, theta-space update."""
        from . import pallas_rollout as PR

        base = params.base
        sigma_inv, op, mu_p, lop, hip = _transposed_operands(
            base.noise_sigma, base.noise_mu, base.u_min, base.u_max,
            config, nsp, nu, dtype,
        )
        lo2 = jnp.tile(jnp.broadcast_to(base.u_min, (nu,)).astype(dtype), T)
        hi2 = jnp.tile(jnp.broadcast_to(base.u_max, (nu,)).astype(dtype), T)
        a_flat = (base.lambda_ * (U @ sigma_inv.T)).reshape(D)
        Wt = jnp.kron(params.interp_full.astype(dtype), jnp.eye(nu, dtype=dtype))
        x0T = _x0_to_lanes(x0, K)
        seed = PR.key_to_seed(k_noise)
        out = transposed_solve(
            seed, x0T, U.reshape(D), theta.reshape(Dp), op, mu_p, lop, hip,
            lo2, hi2, a_flat, Wt, base.lambda_,
        )
        delta_th, m, s, cost_total = out[:4]
        ctnz, omega = PR.weighting_from_stats(cost_total, base.lambda_, m, s)
        theta_new = theta + (delta_th / s).reshape(nsp, nu)
        U_new = params.interp_full @ theta_new
        noise_art = pert_art = None
        if config.fused_artifacts:
            # full-horizon perturbed trajectories come back (D, K); the noise
            # artifact is full-horizon noise (perturbed - U), matching the
            # XLA path's field semantics (the theta-space noise stays
            # in-kernel, exactly like omega @ noise stays in the delta)
            perturbed2 = out[4].T
            noise_art = (perturbed2 - U.reshape(D)[None]).reshape(K, T, nu)
            pert_art = perturbed2.reshape(K, T, nu)
        artifacts = Artifacts(
            cost_total=cost_total, cost_total_non_zero=ctnz, omega=omega,
            noise=noise_art, perturbed_action=pert_art, states=None,
            actions=None,
        )
        return U_new, theta_new, artifacts

    def _one_iteration(params, U, theta, x0, info, k_noise, k_roll, dyn_params):
        if transposed_solve is not None:
            # the gate guarantees adaptive_covariance never reaches here, so
            # the theta-space noise (never materialized by the kernel) is None
            return _one_iteration_fused(params, U, theta, x0, k_noise) + (None,)
        base = params.base
        # flat lane-dense layout (see make_mppi_step): control points live in
        # (K, nsp·nu), the horizon in (K, T·nu).  Noise is sampled only at
        # support points (mppi.py:657-664).
        chol, sigma_inv = _sigma_factors(base.noise_sigma, diag=config.diag_sigma)
        noise_theta2 = sample_noise_flat(
            k_noise, K, nsp, base, dtype, antithetic=config.antithetic, chol=chol,
            noise_rho=config.noise_rho, diag_sigma=config.diag_sigma,
        )
        noise_theta2 = cset(noise_theta2, sample_axis)
        theta2 = theta.reshape(Dp)
        lop = jnp.tile(jnp.broadcast_to(base.u_min, (nu,)).astype(dtype), nsp)
        hip = jnp.tile(jnp.broadcast_to(base.u_max, (nu,)).astype(dtype), nsp)
        perturbed_pts2 = _bound(theta2[None] + noise_theta2, lop, hip)
        noise_theta2 = perturbed_pts2 - theta2[None]
        # deparameterize to the full horizon: one (K,nsp·nu)@(nsp·nu,T·nu) MXU
        # matmul against kron(interp, I_nu) — replacing the reference's per-call
        # vmap linalg.solve (mppi.py:636-655)
        W = jnp.kron(params.interp_full.astype(dtype), jnp.eye(nu, dtype=dtype))
        perturbed2 = perturbed_pts2 @ W.T
        if config.sample_null_action or (
            sample_trajectories is not None and config.num_specific_trajectories > 0
        ):
            p3 = inject_specific_actions(
                config, sample_trajectories, perturbed2.reshape(K, T, nu), x0, info
            )
            perturbed2 = p3.reshape(K, D)
        lo2 = jnp.tile(jnp.broadcast_to(base.u_min, (nu,)).astype(dtype), T)
        hi2 = jnp.tile(jnp.broadcast_to(base.u_max, (nu,)).astype(dtype), T)
        perturbed2 = _bound(perturbed2, lo2, hi2)
        U2 = U.reshape(D)
        noise2 = perturbed2 - U2[None]

        a_flat = (base.lambda_ * (U @ sigma_inv.T)).reshape(D)
        n_for_cost = jnp.abs(noise2) if config.noise_abs_cost else noise2
        perturbation_cost = n_for_cost @ a_flat

        perturbed = perturbed2.reshape(K, T, nu)
        rollout_cost, states, actions = rollout_costs(
            config, dyn, cost, terminal_state_cost, specific_dynamics,
            base, x0, perturbed, k_roll, dyn_params=dyn_params,
            terminal_final_cost=final_cost,
        )
        cost_total = cset(rollout_cost + perturbation_cost, sample_axis)

        cost_total_non_zero, omega = compute_weighting(cost_total, base.lambda_)
        # weighted update in control-point space (mppi.py:672-682)
        theta_new = theta + (omega @ noise_theta2).reshape(nsp, nu)
        U_new = params.interp_full @ theta_new

        artifacts = Artifacts(
            cost_total=cost_total,
            cost_total_non_zero=cost_total_non_zero,
            omega=omega,
            noise=noise2.reshape(K, T, nu),
            perturbed_action=perturbed,
            states=states,
            actions=None if actions is None else actions / jnp.asarray(config.u_scale, dtype),
        )
        # the rectified theta-space noise rides along for adapt_covariance
        # (the artifact surface keeps horizon-space noise, mppi.py:179-184)
        return U_new, theta_new, artifacts, noise_theta2

    def step(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=True, dyn_params=dyn_params)

    def step_no_shift(params, state, x0, info=None, dyn_params=None):
        return _solve(params, state, x0, info, shift=False, dyn_params=dyn_params)

    get_rollouts = make_get_rollouts(config, dyn)

    if jit:
        step = jax.jit(step)
        step_no_shift = jax.jit(step_no_shift)
    return StepFns(step=step, step_no_shift=step_no_shift, get_rollouts=get_rollouts)


# ---------------------------------------------------------------------------
# Step factory — batched N-plant solve (reference MPPI_Batched, mppi.py:691-873)
# ---------------------------------------------------------------------------


class BatchedState(NamedTuple):
    U: jax.Array  # (N, T, nu)
    key: jax.Array


# Measured fused-vs-XLA crossover for the BATCHED kernel (round-3 A/B,
# benchmarks/batched_modes.py; docs/BENCHMARKS.md): below this K the XLA
# scan path wins at every measured N/T.  The single-plant kernels have NO
# crossover — they win at every K measured (round-4 sweep, docs/BENCHMARKS.md).
_BATCHED_KERNEL_MIN_K = 2048


def make_batched_step(
    config: MPPIConfig,
    num_envs: int,
    dynamics: Callable,
    running_cost: Callable,
    terminal_state_cost: Optional[Callable] = None,
    jit: bool = True,
    mesh=None,
    env_axis: str = "data",
    sample_axis: Optional[str] = None,
    use_pallas: bool = False,
    transposed_solve_override=None,
    terminal_final_cost: Optional[Callable] = None,
):
    """N parallel plants sharing one dynamics/cost call per step.

    Noise is sampled once and shared across plants (mppi.py:837-838); the rollout
    flattens (N, K) -> N·K for a single flat-batch dynamics call (mppi.py:844-853);
    weighting is an independent softmax per plant along K (mppi.py:860-868).

    ``terminal_state_cost(states (N, K, T, nx), actions (N, K, T, nu)) ->
    (N, K)`` extends the reference (whose batched controller has no terminal
    cost, SURVEY.md §2.1 C15); rollout storage follows the same lazy contract
    as the single-plant solver.

    This is the scenario-batch component that shards across a device mesh: with only
    N sharded over ``env_axis`` the solve is embarrassingly parallel (SURVEY.md §3.4);
    optionally K also shards over ``sample_axis`` (pod-scale config: 1024 plants x
    K=16k), in which case XLA inserts the per-plant min/sum reductions over ICI.

    ``transposed_solve_override`` injects a pre-built batched fused kernel
    (pallas_rollout.make_transposed_batched_solve) in place of the
    ``use_pallas`` route — the hook tests and benchmarks use to drive both
    sampling modes (in-kernel regeneration vs noise-as-operand) through the
    identical iteration plumbing.
    """
    if config.num_iterations < 1:
        raise ValueError(
            f"config.num_iterations must be >= 1, got {config.num_iterations}"
        )
    _check_risk_alpha_range(config)
    if config.risk_alpha > 0.0 or config.M > 1:
        raise ValueError(
            "rollout_samples (M) > 1 / risk_alpha are not supported on "
            "MPPI_Batched: the batched rollout has no stochastic-rollout (M) "
            "axis (mppi.py:844-853); fold plant-dynamics uncertainty into "
            "extra plants instead"
        )
    _gate_gradient_refinement(config, "MPPI_Batched")
    _gate_elites(config, "MPPI_Batched")
    _gate_terminal(terminal_state_cost, terminal_final_cost)
    if config.adaptive_covariance:
        raise ValueError(
            "adaptive_covariance is not supported on MPPI_Batched: the N "
            "plants share ONE noise draw (mppi.py:837-838), so a per-plant "
            "covariance would break the shared-noise design and a pooled one "
            "would mix unrelated plants; use per-plant MPPI controllers if "
            "you need it"
        )
    dyn = wrap_dynamics(config, dynamics)
    cost = wrap_cost(config, running_cost)
    final_cost = (
        wrap_final_cost(terminal_final_cost)
        if terminal_final_cost is not None else None
    )
    dtype = config.dtype
    N, K, T, nu, nx = num_envs, config.K, config.T, config.nu, config.nx
    cset = make_constrainer(mesh)
    kax = sample_axis  # may be None: K replicated within each env shard

    D = T * nu

    if transposed_solve_override is not None and (
        config.fused_artifacts or mesh is not None
    ):
        # the override hook bypasses the use_pallas route's guards; fail loud
        # rather than silently dropping requested artifacts or sharding
        raise ValueError(
            "transposed_solve_override is incompatible with fused_artifacts "
            "and with meshed (sharded) batched steps — the injected kernel "
            "bypasses the guards the use_pallas route applies"
        )
    transposed_solve = transposed_solve_override
    if config.sample_null_action:
        # parity with the reference: MPPI_Batched has no null-action/sampler
        # hooks (mppi.py:691-873); neither the XLA nor the fused batched path
        # injects it, so a hand-built config setting it would be silently
        # ignored without this.
        logger.warning(
            "MPPI_Batched does not support sample_null_action (matching the "
            "reference); the flag is ignored"
        )
    if use_pallas and config.fused_artifacts:
        logger.warning(
            "use_pallas on MPPI_Batched with fused_artifacts: the batched "
            "kernel exists to keep the (N, K, T*nu) tensors out of HBM, so "
            "materializing them is not supported; using the XLA scan path "
            "(full artifact surface)"
        )
        use_pallas = False
    if use_pallas is True and config.K < _BATCHED_KERNEL_MIN_K:
        # honest default: route by the MEASURED crossover (round-3 A/B,
        # docs/BENCHMARKS.md — below K~2048 the XLA scan wins even against
        # the noise-operand mode: kernel grid overhead outweighs the saved
        # HBM traffic).  Explicit mode strings ("force", "kernel_rng") keep
        # the kernel regardless for A/Bs and unmeasured dynamics.
        logger.info(
            "use_pallas=True on MPPI_Batched with K=%d: the fused kernel "
            "measured faster only for K >= ~%d, so the XLA scan path is "
            "used; pass use_pallas='force' (noise-operand mode) or "
            "'kernel_rng' to keep the kernel anyway",
            config.K, _BATCHED_KERNEL_MIN_K,
        )
        use_pallas = False
    if use_pallas and transposed_solve is None:
        from . import pallas_rollout as PR

        # Sampling-mode default, pinned by the round-3 A/B
        # (benchmarks/batched_modes.py, docs/BENCHMARKS.md): one XLA rbg draw
        # fed as a VMEM operand beats N-fold in-kernel regeneration at EVERY
        # measured shape (1.2-1.5x) — the shared (K, T*nu) noise is tiny next
        # to the (N, K, T*nu) tensor both modes avoid.  use_pallas="kernel_rng"
        # keeps the zero-HBM-noise mode selectable for the decision record.
        noise_operand = use_pallas != "kernel_rng"
        if mesh is not None and kax is not None:
            logger.warning(
                "use_pallas on MPPI_Batched with BOTH env and sample axes "
                "sharded is not supported by the fused kernels; using the "
                "XLA scan path"
            )
        elif mesh is not None:
            # plants sharded over env_axis: per-shard batched kernels, zero
            # collectives (per-plant softmax is shard-local; the shared noise
            # operand — or block-indexed seeds in kernel_rng mode — is
            # replicated across shards)
            transposed_solve = _route_transposed_solve(
                config,
                lambda: make_sharded_batched_solve(
                    config, N, dyn, cost, mesh, env_axis,
                    noise_operand=noise_operand, terminal_final=final_cost,
                ),
                terminal_state_cost, None, None, mesh, "MPPI_Batched",
                sharded=True,
                sharded_desc="env-sharded: per-shard batched kernels, "
                "no collectives",
            )
        else:
            transposed_solve = _route_transposed_solve(
                config,
                lambda: PR.make_transposed_batched_solve(
                    config, N, dyn, cost, noise_operand=noise_operand,
                    terminal_final=final_cost,
                ),
                terminal_state_cost, None, None, mesh, "MPPI_Batched",
            )
        if transposed_solve is not None and config.K < _BATCHED_KERNEL_MIN_K:
            # an explicit mode string bypassed the auto-route above: keep
            # the kernel but say what the measurement predicts
            logger.warning(
                "use_pallas=%r on MPPI_Batched with K=%d: the fused kernel "
                "measured faster only for K >= ~%d; the XLA path is "
                "likely faster here",
                use_pallas, config.K, _BATCHED_KERNEL_MIN_K,
            )

    def _one_iteration_fused(params, U, x0, k_noise):
        """The whole N-plant iteration as one (N, K-blocks)-grid kernel.
        Two sampling modes (pallas_rollout.make_transposed_batched_solve):
        one XLA draw passed as a (D, K_pad) operand
        (``solve.noise_operand``, the ``use_pallas=True`` default — won the
        round-3 A/B at every measured shape), or in-kernel regeneration of
        the shared noise from block-indexed hardware seeds (selected via
        ``use_pallas="kernel_rng"``).  Either way the (N, K, T·nu)
        perturbed tensor never exists in HBM."""
        from . import pallas_rollout as PR

        sigma_inv, op, mu_t, lo2, hi2 = _transposed_operands(
            params.noise_sigma, params.noise_mu, params.u_min, params.u_max,
            config, T, nu, dtype,
        )
        a2 = (params.lambda_ * jnp.einsum("ntu,vu->ntv", U, sigma_inv)).reshape(N, D)
        if getattr(transposed_solve, "noise_operand", False):
            chol, _ = _sigma_factors(params.noise_sigma, diag=config.diag_sigma)
            noise2 = sample_noise_flat(
                k_noise, K, T, params, dtype, antithetic=config.antithetic,
                chol=chol, noise_rho=config.noise_rho,
                diag_sigma=config.diag_sigma,
            )  # (K, D), the ONE shared draw (mppi.py:837-838)
            lead = jnp.pad(
                noise2, ((0, transposed_solve.K_pad - K), (0, 0))
            ).T  # (D, K_pad); phantom rows are +inf-masked in the kernel
        else:
            lead = PR.key_to_seed(k_noise)
        delta, ms, cost_total = transposed_solve(
            lead, x0.T, U.reshape(N, D).T, op, mu_t, lo2, hi2, a2.T,
            params.lambda_,
        )
        m, s = ms[0], ms[1]  # (N,), (N,)
        ctnz, omega = PR.weighting_from_stats(
            cost_total, params.lambda_, m[:, None], s[:, None]
        )
        U_new = U + (delta / s[None, :]).T.reshape(N, T, nu)
        artifacts = Artifacts(
            cost_total=cost_total, cost_total_non_zero=ctnz, omega=omega,
            noise=None, perturbed_action=None, states=None, actions=None,
        )
        return U_new, artifacts

    def _solve(params: MPPIParams, state: BatchedState, x0, shift: bool, dyn_params=None):
        U = state.U  # (N, T, nu)
        if shift:
            U = jnp.roll(U, -1, axis=1).at[:, -1].set(params.u_init)
        U = cset(U, env_axis)
        key = state.key
        x0 = jnp.asarray(x0, dtype)  # (N, nx)

        # optimization iterations per command (see make_mppi_step): re-center
        # the shared-noise sampling on every plant's updated nominal sequence
        for _ in range(config.num_iterations):
            key, k_noise, k_roll = jax.random.split(key, 3)
            U, artifacts = _one_iteration(params, U, x0, k_noise, k_roll, dyn_params)

        action = U[:, : config.u_per_command]
        if config.u_per_command == 1:
            action = action[:, 0]
        return BatchedState(U=U, key=key), action, artifacts

    def _one_iteration(params, U, x0, k_noise, k_roll, dyn_params):
        if transposed_solve is not None:
            return _one_iteration_fused(params, U, x0, k_noise)
        # flat (·, T·nu) lane-dense layout (see make_mppi_step); noise is
        # sampled once and shared across envs (mppi.py:837-838)
        chol, sigma_inv = _sigma_factors(params.noise_sigma, diag=config.diag_sigma)
        noise2 = sample_noise_flat(
            k_noise, K, T, params, dtype, antithetic=config.antithetic, chol=chol,
            noise_rho=config.noise_rho, diag_sigma=config.diag_sigma,
        )  # (K, D)
        noise2 = cset(noise2, kax)
        U2 = U.reshape(N, D)
        lo2 = jnp.tile(jnp.broadcast_to(params.u_min, (nu,)).astype(dtype), T)
        hi2 = jnp.tile(jnp.broadcast_to(params.u_max, (nu,)).astype(dtype), T)
        perturbed2 = _bound(U2[:, None] + noise2[None], lo2, hi2)  # (N, K, D)
        perturbed2 = cset(perturbed2, env_axis, kax)
        actual_noise2 = perturbed2 - U2[:, None]
        perturbed = perturbed2.reshape(N, K, T, nu)

        state0 = jnp.broadcast_to(x0[:, None], (N, K, nx)).reshape(N * K, nx)
        state0 = cset(state0, (env_axis, kax) if kax else env_axis)
        u_scaled = jnp.moveaxis(perturbed, 2, 0).reshape(T, N * K, nu) * jnp.asarray(
            config.u_scale, dtype
        )
        step_keys = (
            jax.random.split(k_roll, T)
            if config.stochastic_dynamics
            else jnp.zeros((T, 1), dtype=jnp.uint32)
        )

        store = terminal_state_cost is not None

        def body(carry, inp):
            s, c_tot = carry
            u_t, t, k_t = inp
            s = dyn(dyn_params, s, u_t, t, k_t)
            c = cost(s, u_t, t).reshape(N, K)
            ys = s.reshape(N, K, -1)[..., :nx] if store else None
            return (s, c_tot + c), ys

        (s_final, cost_total), ys = lax.scan(
            body,
            (state0, jnp.zeros((N, K), dtype)),
            (u_scaled, jnp.arange(T), step_keys),
            unroll=config.scan_unroll,
        )

        if final_cost is not None:
            # final-state terminal cost on the scan CARRY (see
            # wrap_final_cost): no (N, K, T, nx) storage, final action
            # u_scale-scaled like the single-plant path
            tc = final_cost(s_final[..., :nx], u_scaled[-1])
            cost_total = cost_total + jnp.asarray(tc, dtype).reshape(N, K)

        states = None
        if store:
            # (T, N, K, nx) -> (N, K, T, nx), same layout convention as the
            # single-plant path (reference mppi.py:309-310)
            states = jnp.moveaxis(ys, 0, 2)
            # terminal cost sees u_scale-SCALED actions, exactly like the
            # single-plant path stores them (rollout_costs scales before the
            # scan; reference mppi.py:313)
            acts = perturbed if config.u_scale == 1.0 else (
                perturbed * jnp.asarray(config.u_scale, dtype)
            )
            tc = jnp.asarray(terminal_state_cost(states, acts), dtype)
            cost_total = cost_total + tc.reshape(N, K)

        # per-env action cost folded to one (N,K,D)·(N,D) contraction
        a2 = (params.lambda_ * jnp.einsum("ntu,vu->ntv", U, sigma_inv)).reshape(N, D)
        n_for_cost = jnp.abs(actual_noise2) if config.noise_abs_cost else actual_noise2
        perturbation_cost = jnp.einsum("nkd,nd->nk", n_for_cost, a2)
        total_cost = cset(cost_total + perturbation_cost, env_axis, kax)  # (N, K)

        cost_total_non_zero, omega = compute_weighting(
            total_cost, params.lambda_, axis=1
        )
        perturbations = jnp.einsum("nk,nkd->nd", omega, actual_noise2).reshape(
            N, T, nu
        )
        U_new = U + perturbations

        artifacts = Artifacts(
            cost_total=total_cost,
            cost_total_non_zero=cost_total_non_zero,
            omega=omega,
            noise=actual_noise2.reshape(N, K, T, nu),
            perturbed_action=perturbed,
            states=states,
            actions=None,
        )
        return U_new, artifacts

    def step(params, state, x0, dyn_params=None):
        return _solve(params, state, x0, shift=True, dyn_params=dyn_params)

    def step_no_shift(params, state, x0, dyn_params=None):
        return _solve(params, state, x0, shift=False, dyn_params=dyn_params)

    if jit:
        step = jax.jit(step)
        step_no_shift = jax.jit(step_no_shift)
    return StepFns(step=step, step_no_shift=step_no_shift, get_rollouts=None)
