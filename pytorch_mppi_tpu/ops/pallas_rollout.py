"""Fused Pallas TPU kernels for the MPPI hot path.

Three kernels, per the north-star design (BASELINE.json; SURVEY.md §2.4):

1. :func:`make_fused_rollout` — the K x T rollout + running-cost accumulation as a
   single Pallas kernel.  The user's (traceable) dynamics and running-cost are
   traced *into* the kernel body, the horizon loop is unrolled on-chip, and the
   state never leaves VMEM between timesteps — replacing the ~2T XLA ops of the
   ``lax.scan`` path (reference hot loop: mppi.py:312-331).

2. :func:`fused_weighted_update` — the cost-weighted softmax update as ONE pass
   over K using an online (flash-style) softmax: running max m, normalizer s, and
   weighted-noise accumulator v are carried across K-blocks in VMEM scratch, so
   beta/eta/omega (mppi.py:254-259) and the einsum reduction (mppi.py:268-270)
   never materialize omega in HBM.

3. :func:`make_fused_solve` — the ENTIRE solve (hardware-PRNG noise generation,
   bound rectification, action cost, rollout, flash-softmax update) as one kernel;
   the (K, T, nu) noise tensor never exists in HBM.  Kept as an ops-level utility:
   on v5e the XLA rbg sampler + flat-layout scan path (ops/solve.py) outruns it
   for cheap dynamics, so the solver factories route ``use_pallas`` to kernels
   1+2 only.

Eligibility: M == 1, no rollout storage (no terminal cost), no specific-dynamics
hook, deterministic dynamics, float32, unsharded.  The solver factory falls back
to the scan path otherwise (SURVEY.md §7 hard part (c)).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MPPIConfig

# Kernels run compiled on TPU; on CPU (tests) they run in interpreter mode.
def _interpret():
    return jax.default_backend() != "tpu"


def _block_and_pad(K: int) -> tuple:
    """Choose a TPU-friendly K block (lane-dim must be a multiple of 128) and the
    padded K.  Padded rows cost +inf and carry zero noise, so they contribute
    exactly nothing to the weighting."""
    block = 1024 if K >= 1024 else 128
    K_pad = ((K + block - 1) // block) * block
    return block, K_pad


def fused_solve_block_and_pad(K: int) -> tuple:
    """K-block and padded K for :func:`make_fused_solve` (smaller than the
    rollout-only kernel's: ~8 live lane-padded buffers per grid step)."""
    block = 512 if K >= 512 else 128
    return block, ((K + block - 1) // block) * block


def pallas_eligible(config: MPPIConfig, has_terminal: bool, has_specific: bool) -> bool:
    return (
        config.M == 1
        and not has_terminal
        and not has_specific
        and not config.stochastic_dynamics
        # parameterized dynamics would bake the weight pytree into the kernel
        # as trace-time constants (stale after retraining) — and the factory
        # traces with params=None anyway; close over fixed weights instead
        and not config.parameterized_dynamics
        and config.dtype == jnp.float32
    )


def make_fused_rollout(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    block_k: int = None,
):
    """Build the fused rollout: (x0 (K, nx), u_scaled (T, K, nu)) -> cost (K,).

    User dynamics/cost typically close over arrays (goal vectors, B matrices);
    Pallas kernels cannot capture traced constants, so ``jax.closure_convert``
    hoists them into explicit kernel inputs.

    ``block_k`` overrides the K-block heuristic (must be a multiple of 128 and
    fit the working set in VMEM); ``block_k == K_pad`` runs the whole batch in
    one grid step — bigger per-dot batches at the cost of DMA/compute overlap.
    """
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    dtype = config.dtype
    if block_k is None:
        block_k, K_pad = _block_and_pad(K)
    else:
        if block_k % 128:
            raise ValueError(f"block_k={block_k} must be a multiple of 128")
        K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k

    def _body(state, u, t):
        ns = dynamics(None, state, u, t, None)
        c = running_cost(ns, u, t)
        return ns, c

    # extract closed-over constants (goal vectors, B matrices, ...) from the user
    # functions: trace once to a jaxpr, then re-inject the consts as kernel inputs
    closed = jax.make_jaxpr(_body)(
        jnp.zeros((block_k, nx), dtype),
        jnp.zeros((block_k, nu), dtype),
        jnp.zeros((), jnp.int32),
    )
    consts = closed.consts

    def converted(state, u, t, *const_vals):
        outs = jax.core.eval_jaxpr(closed.jaxpr, const_vals, state, u, t)
        return outs[0], outs[1]
    # scalars ride in SMEM as (1,); arrays ride whole in VMEM, replicated per block
    const_specs, const_inputs, const_unpack = [], [], []
    for cst in consts:
        cst = jnp.asarray(cst)
        if cst.ndim == 0:
            const_inputs.append(cst.reshape(1))
            const_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            const_unpack.append(lambda ref: ref[0])
        else:
            const_inputs.append(cst)
            const_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            const_unpack.append(lambda ref: ref[...])

    def kernel(x0_ref, u_ref, *refs):
        # u_ref block: (block_k, T*nu) — K on sublanes, T*nu on lanes keeps the
        # block lane-dense (a (T, block_k, nu) layout pads nu->128 lanes and
        # blows the 16M VMEM budget at K=10k, T=30)
        const_refs, out_ref = refs[:-1], refs[-1]
        cvals = [unpack(r) for unpack, r in zip(const_unpack, const_refs)]
        state = x0_ref[...]  # (block_k, nx) stays in VMEM for the whole horizon
        total = jnp.zeros((block_k,), dtype)
        for t in range(T):  # static unroll: dynamics/cost trace into the kernel
            u_t = u_ref[:, t * nu : (t + 1) * nu]  # static lane slice
            state, c = converted(state, u_t, jnp.int32(t), *cvals)
            total = total + c.reshape(block_k)
        # 2-D (1, block_k) row layout: XLA's 1-D tiling (T(256)/T(1024) by
        # length) clashes with Mosaic's T(block) for small K — rows of a 2-D
        # output have no such tile mismatch
        out_ref[...] = total.reshape(1, block_k)

    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_k, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, T * nu), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K_pad), dtype),
        interpret=_interpret(),
    )

    def rollout(x0_K, u_scaled_ktn):
        """x0_K: (K, nx) initial states; u_scaled_ktn: (K, T, nu) scaled actions."""
        u2d = u_scaled_ktn.reshape(K, T * nu)
        if K_pad != K:
            x0_K = jnp.pad(x0_K, ((0, K_pad - K), (0, 0)))
            u2d = jnp.pad(u2d, ((0, K_pad - K), (0, 0)))
        return fused(x0_K, u2d, *const_inputs).reshape(K_pad)[:K]

    return rollout


def fused_weighted_update(cost_total: jax.Array, noise_flat: jax.Array, lambda_):
    """Streaming softmax-weighted reduction over K in one pass.

    :param cost_total: (K,) total costs
    :param noise_flat: (K, D) rectified noise flattened over (T, nu)
    :param lambda_: temperature (traced scalar)
    :returns: (perturbations (D,), m (), s ()) where logits l = -cost/lambda,
        m = max(l), s = sum exp(l - m); omega = exp(l - m)/s and the
        perturbation update is v/s.  Matches mppi.py:254-270 exactly because
        max(l) corresponds to beta = min(cost).
    """
    K, D = noise_flat.shape
    dtype = noise_flat.dtype
    block_k, K_pad = _block_and_pad(K)
    nblocks = K_pad // block_k
    if K_pad != K:
        # padded rows: +inf cost -> logits -inf -> weight exactly 0
        cost_total = jnp.pad(cost_total, (0, K_pad - K), constant_values=jnp.inf)
        noise_flat = jnp.pad(noise_flat, ((0, K_pad - K), (0, 0)))
    # 2-D (1, K_pad) row layout for the cost input: XLA's 1-D tiling clashes
    # with Mosaic's T(block) for small K (see make_fused_rollout)
    cost_total = cost_total.reshape(1, K_pad)

    def kernel(lam_ref, cost_ref, noise_ref, pert_ref, m_ref, s_ref, acc_ref):
        i = pl.program_id(0)
        logits = -cost_ref[...].reshape(block_k) / lam_ref[0]  # (block_k,)
        blk_m = jnp.max(logits)

        @pl.when(i == 0)
        def _():
            m_ref[0] = -jnp.inf
            s_ref[0] = 0.0
            acc_ref[...] = jnp.zeros_like(acc_ref)

        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, blk_m)
        # rescale the running accumulators (flash-softmax)
        scale = jnp.exp(m_old - m_new)
        w = jnp.exp(logits - m_new)  # (block_k,)
        s_ref[0] = s_ref[0] * scale + jnp.sum(w)
        # HIGHEST precision: the (1, block)@(block, D) matvec is negligible
        # next to the HBM read of the noise block, and bf16 inputs would cost
        # ~0.2% on the final update
        acc_ref[...] = acc_ref[...] * scale + jnp.dot(
            w[None, :], noise_ref[...],
            preferred_element_type=noise_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_ref[0] = m_new

        @pl.when(i == nblocks - 1)
        def _():
            pert_ref[...] = acc_ref[...]

    pert, m, s = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lambda (1,)
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((1, D), dtype)],
        interpret=_interpret(),
    )(
        jnp.asarray(lambda_, dtype).reshape(1),
        cost_total,
        noise_flat,
    )
    return pert.reshape(D), m[0], s[0]


# ---------------------------------------------------------------------------
# Transposed (K-on-lanes) fully-fused solve — the measured-best kernel design
# ---------------------------------------------------------------------------


def transposed_eligible(config: MPPIConfig, has_terminal: bool,
                        has_specific_sampler: bool, mesh) -> bool:
    """Static eligibility for :func:`make_transposed_fused_solve` (the jaxpr
    support probe happens inside the factory): M=1, no rollout storage, no
    user-injected rows (``sample_null_action`` is handled in-kernel),
    deterministic unparameterized dynamics, f32, unsharded.  Elite reuse
    (``num_elites``) composes with the kernel ONLY under ``fused_artifacts``:
    injection rides a (D, 128) operand overwriting block-0 columns, and the
    top-k refresh needs the materialized perturbed set the artifact store
    provides; without it (or with more injected rows than one lane block)
    the config is ineligible."""
    elites_ok = config.num_elites == 0 or (
        config.fused_artifacts
        and config.num_elites + (1 if config.sample_null_action else 0) <= 128
    )
    return (
        config.M == 1
        and not has_terminal
        and not has_specific_sampler
        and elites_ok
        and not config.stochastic_dynamics
        and not config.parameterized_dynamics
        and mesh is None
        and config.dtype == jnp.float32
    )


def _transposed_block(K: int, D: int) -> tuple:
    """K block for the transposed kernel.  The working set is ~6 live
    (D-padded-to-8-sublanes, block) f32 buffers; the round-2 study measured
    the single-block configuration fastest at the flagship shape (no grid
    re-issue overhead), so take the whole padded K when it fits in ~12 MB of
    VMEM and shrink by halving otherwise."""
    D_pad = ((D + 7) // 8) * 8
    block = ((K + 127) // 128) * 128
    while block > 128 and 6 * D_pad * block * 4 > 12 * 2**20:
        block //= 2
        block = ((block + 127) // 128) * 128
    return block, ((K + block - 1) // block) * block


def _hoist_consts(consts):
    """Kernel input plumbing for jaxpr closure constants: scalars ride in
    SMEM as (1,), arrays ride whole in VMEM, replicated per block."""
    const_specs, const_inputs, const_unpack = [], [], []
    for cst in consts:
        cst = jnp.asarray(cst)
        if cst.ndim == 0:
            const_inputs.append(cst.reshape(1))
            const_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            const_unpack.append(lambda ref: ref[0])
        else:
            const_inputs.append(cst)
            const_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            const_unpack.append(lambda ref: ref[...])
    return const_specs, const_inputs, const_unpack


def _trace_body_transposed(config, dynamics, running_cost, block_k):
    """Trace the per-step dynamics+cost body at the ORIGINAL (batch-first)
    block shape and probe batch-last support; returns (closed_jaxpr, consts).
    Raises UnsupportedPrimitive when out of the transform's vocabulary."""
    from . import batch_last as BL

    dtype = config.dtype

    def _body(state, u, t):
        ns = dynamics(None, state, u, t, None)
        c = running_cost(ns, u, t)
        return ns, c

    closed = jax.make_jaxpr(_body)(
        jnp.zeros((block_k, config.nx), dtype),
        jnp.zeros((block_k, config.nu), dtype),
        jnp.zeros((), jnp.int32),
    )
    ok, msg = BL.supports_batch_last(
        closed.jaxpr, closed.consts,
        [
            jax.ShapeDtypeStruct((block_k, config.nx), dtype),
            jax.ShapeDtypeStruct((block_k, config.nu), dtype),
            jax.ShapeDtypeStruct((), jnp.int32),
        ],
        [True, True, False], block_k,
    )
    if not ok:
        raise BL.UnsupportedPrimitive(msg)
    return closed, closed.consts


def _trace_terminal_transposed(config, terminal_final, block_k):
    """Trace the wrapped final-state terminal cost ``(state, u) -> cost`` at
    the ORIGINAL (batch-first) block shape and probe batch-last support (same
    contract as :func:`_trace_body_transposed`); returns (closed_jaxpr,
    consts).  Raises UnsupportedPrimitive when out of the transform's
    vocabulary — callers fall back to the XLA scan path."""
    from . import batch_last as BL

    dtype = config.dtype
    closed = jax.make_jaxpr(terminal_final)(
        jnp.zeros((block_k, config.nx), dtype),
        jnp.zeros((block_k, config.nu), dtype),
    )
    ok, msg = BL.supports_batch_last(
        closed.jaxpr, closed.consts,
        [
            jax.ShapeDtypeStruct((block_k, config.nx), dtype),
            jax.ShapeDtypeStruct((block_k, config.nu), dtype),
        ],
        [True, True], block_k,
    )
    if not ok:
        raise BL.UnsupportedPrimitive(msg)
    return closed, closed.consts


def _split_term_consts(consts, term_consts):
    """Hoist the rollout body's and the (optional) terminal jaxpr's closure
    constants through ONE kernel-input list; returns (specs, inputs, a
    splitter mapping the kernel's const refs back to (body_cvals,
    term_cvals))."""
    n_body = len(consts)
    all_consts = list(consts) + (list(term_consts) if term_consts else [])
    const_specs, const_inputs, const_unpack = _hoist_consts(all_consts)

    def split(const_refs):
        cvals = [unpack(r) for unpack, r in zip(const_unpack, const_refs)]
        return cvals[:n_body], cvals[n_body:]

    return const_specs, const_inputs, split


def _tp_draw_noise(lead_ref, i, rows, bh, block_k, rng_in_kernel, antithetic,
                   op_ref, mu_ref, diag_fast, dtype):
    """In-kernel noise block (rows, block_k): hardware bits (or injected
    bits) -> N(0,1) -> optional antithetic lane-mirroring -> correlation
    (lane-broadcast scale for white-diagonal sigma, else the (rows, rows)
    transposed mixing operator)."""
    if rng_in_kernel:
        pltpu.prng_seed(lead_ref[0] + i, lead_ref[1])
        bits = pltpu.prng_random_bits((rows, bh))
    else:
        bits = lead_ref[...]
    z = _bits_to_normal(bits, use_pltpu=rng_in_kernel and not _interpret())
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
    if diag_fast:
        return z * op_ref[...] + mu_ref[...]
    return jnp.dot(
        op_ref[...], z, preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    ) + mu_ref[...]


def _tp_rollout_total(closed, cvals, state0, perturbed, config, block_k,
                      term=None, term_cvals=None):
    """Unrolled batch-last rollout + running-cost accumulation inside the
    kernel; ``state0`` is the (nx, block_k) initial-state value; returns the
    (1, block_k) accumulated rollout cost.  With ``term`` (the traced
    final-state terminal cost, see :func:`_trace_terminal_transposed`) the
    terminal cost of the FINAL state and final u_scale-scaled action is
    added — the same (final_state, final_action) contract the XLA scan path
    applies (solve.rollout_costs)."""
    from . import batch_last as BL

    T, nu = config.T, config.nu
    u_scale = float(config.u_scale)
    state = state0
    total = jnp.zeros((1, block_k), config.dtype)
    for t in range(T):
        u_t = perturbed[t * nu:(t + 1) * nu, :]
        if u_scale != 1.0:
            u_t = u_t * u_scale
        state, c = BL.eval_jaxpr_batch_last(
            closed.jaxpr, cvals, [state, u_t, jnp.int32(t)],
            [True, True, False], block_k,
        )
        total = total + c.reshape(1, block_k)
    if term is not None:
        (c,) = BL.eval_jaxpr_batch_last(
            term.jaxpr, term_cvals, [state, u_t], [True, True], block_k,
        )
        total = total + c.reshape(1, block_k)
    return total


def _tp_mask_phantom(total, i, K, K_pad, block_k):
    """Phantom rows (global index >= K) get +inf cost -> weight exactly 0."""
    if K_pad == K:
        return total
    gid = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + i * block_k
    return jnp.where(gid < K, total, jnp.inf)


def _tp_flash_accumulate(i, logits, upd_vec, m_ref, s_ref, acc_ref,
                         block_k, dtype):
    """ONE copy of the numerically delicate streaming flash-softmax merge
    (mppi.py:254-270), shared by every transposed kernel: reset the running
    (max m, normalizer s, weighted-update accumulator) at block 0, then
    rescale-and-accumulate.  ``upd_vec`` is the (rows, block_k) vector whose
    weighted sum is being accumulated (rectified noise, or theta-space noise
    for KMPPI)."""
    blk_m = jnp.max(logits)

    @pl.when(i == 0)
    def _():
        m_ref[0] = -jnp.inf
        s_ref[0] = 0.0
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m_old = m_ref[0]
    m_new = jnp.maximum(m_old, blk_m)
    sc = jnp.exp(m_old - m_new)
    w = jnp.exp(logits - m_new)
    s_ref[0] = s_ref[0] * sc + jnp.sum(w)
    acc_ref[...] = acc_ref[...] * sc + jnp.dot(
        upd_vec, w.reshape(block_k, 1), preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    m_ref[0] = m_new


def _tp_flash_tail(i, nblocks, total, lam, upd_vec, cost_out, delta_ref,
                   m_ref, s_ref, acc_ref, K, K_pad, block_k, dtype):
    """Standard single-plant tail: mask phantoms, write the cost row, run the
    shared flash merge, finalize delta at the last block."""
    total = _tp_mask_phantom(total, i, K, K_pad, block_k)
    cost_out[...] = total
    logits = -cost_out[...] / lam
    _tp_flash_accumulate(i, logits, upd_vec, m_ref, s_ref, acc_ref, block_k,
                         dtype)

    @pl.when(i == nblocks - 1)
    def _():
        delta_ref[...] = acc_ref[...]


def _tp_gate_operand(gate, null_gate):
    """Validate + convert the trailing null-gate argument of a transposed
    solve.  Loud on arity mismatch: a gate passed to a kernel built WITHOUT
    ``null_dynamic_gate=True`` would otherwise be silently swallowed by the
    ``*gate`` varargs and every shard would statically inject its own local
    null sample (one per shard instead of one global)."""
    if len(gate) != (1 if null_gate else 0):
        raise TypeError(
            f"this fused solve takes {1 if null_gate else 0} trailing "
            f"null-gate argument(s) but was called with {len(gate)}; the "
            f"gate exists only when BOTH config.sample_null_action is set "
            f"and the kernel was built with null_dynamic_gate=True"
        )
    return (jnp.asarray(gate[0], jnp.int32).reshape(1),) if null_gate else ()


def make_transposed_fused_solve(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    block_k: int = None,
    rng_in_kernel: bool = True,
    emit_perturbed: bool = False,
    null_dynamic_gate: bool = False,
    terminal_final: Callable = None,  # wrapped: (state, u) -> cost
):
    """The ENTIRE MPPI iteration as ONE transposed-layout Pallas kernel, for
    arbitrary traceable dynamics/costs.

    This productizes (and improves on) the round-2 kernel study's best design
    (docs/DESIGN.md §6).  Measured on v5e at the flagship shape (K=10k,
    T=30): **24.1 µs vs 25.2 µs XLA (1.04x)** for linear dynamics and
    **71.6 µs vs 117.1 µs (1.64x)** for a 2-layer MLP — the first kernel to
    beat the XLA pipeline on this problem class.  The layout: the sample
    axis K rides the LANE dimension — noise ``(D, block_k)``, state
    ``(nx, block_k)``, cost ``(1, block_k)`` — so every elementwise pass is
    lane-dense even at control-sized nx/nu, and the weighted update is a
    full-contraction ``(D, bk) @ (bk, 1)`` MXU matvec.  In-kernel hardware
    PRNG: the noise tensor never exists in HBM (the hybrid XLA-noise variant
    measured slower, §6).  User dynamics/costs are traced to a jaxpr once
    (closure constants hoisted to kernel inputs, as in
    :func:`make_fused_rollout`) and evaluated *batch-axis-last* by
    :mod:`..ops.batch_last` — no in-kernel transposes, and the user's own
    matmul precision is preserved (default bf16-input MXU, matching what XLA
    does to the same dots in the scan path).

    Raises :class:`~pytorch_mppi_tpu.ops.batch_last.UnsupportedPrimitive` at
    build time when the traced user code falls outside the transform's
    vocabulary; callers fall back to the XLA scan path.

    :returns: ``solve(seed_or_bits, x0T (nx, K), U2 (D,), op, mu_t (D,),
        lo_t (D,), hi_t (D,), a_flat (D,), lambda) ->
        (delta (D,), m (), s (), cost_total (K,))`` where ``U_new = U +
        (delta / s).reshape(T, nu)``; ``op`` is the (D,) per-lane scale for
        white diagonal sigma, else the (D, D) transposed mixing operator
        ``kron(A_rho, chol)`` applied as ``op @ z``.  With
        ``rng_in_kernel=False`` (CPU interpret tests) ``seed_or_bits`` is
        int32 bits of shape (D, K_pad) — or (D, K_pad//2) under antithetic.

    With ``emit_perturbed`` the kernel additionally writes the clamped
    perturbed actions (the one tensor the artifact surface needs: rectified
    noise is exactly ``perturbed - U``, the same subtraction the kernel
    itself uses) and the solve returns a fifth element ``perturbed (D, K)``.
    Costs one (D, K) HBM store per solve (~2.4 MB at the flagship shape) —
    opt-in via ``MPPIConfig.fused_artifacts``.

    With ``null_dynamic_gate`` (only meaningful when
    ``config.sample_null_action``) the null-action injection is controlled by
    a trailing (1,) int32 SMEM operand instead of being unconditionally
    applied to block 0: the K-sharded wrapper passes ``axis_index == 0`` so
    exactly ONE shard zeroes its first sample globally.
    """
    from . import batch_last as BL

    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    D = T * nu
    dtype = config.dtype
    if dtype != jnp.float32:
        raise ValueError("transposed fused solve requires float32")
    if block_k is None:
        block_k, K_pad = _transposed_block(K, D)
    else:
        if block_k % 128:
            raise ValueError(f"block_k={block_k} must be a multiple of 128")
        K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k
    antithetic = config.antithetic
    diag_fast = config.diag_sigma and not config.noise_rho
    null_action = config.sample_null_action
    null_gate = null_action and null_dynamic_gate
    u_scale = float(config.u_scale)
    bh = block_k // 2 if antithetic else block_k
    # elite reuse (MPPIConfig.num_elites, docs/DESIGN.md §11): the shifted
    # elite trajectories ride a (D, 128) VMEM operand whose columns sit at
    # their GLOBAL sample indices (after the null row); block 0 overwrites
    # those columns before the clamp — the same inject-then-bound order as
    # the XLA path's inject_specific_actions
    num_elites = config.num_elites
    elite_off = 1 if null_action else 0
    if num_elites and num_elites + elite_off > min(K, 128):
        from .solve import FusedSolveUnavailable  # lazy: avoids module cycle

        raise FusedSolveUnavailable(
            f"num_elites={num_elites} (+{elite_off} null) exceeds the "
            f"kernel's one-lane-block injection window (min(K, 128))"
        )

    closed, consts = _trace_body_transposed(config, dynamics, running_cost,
                                            block_k)
    term = term_consts = None
    if terminal_final is not None:
        term, term_consts = _trace_terminal_transposed(
            config, terminal_final, block_k)
    const_specs, const_inputs, split_cvals = _split_term_consts(
        consts, term_consts)

    def kernel(*refs):
        (lead_ref, x0_ref, U_ref, op_ref, mu_ref, lo_ref, hi_ref, a_ref,
         lam_ref, *rest) = refs
        if num_elites:
            el_ref, *rest = rest
        if null_gate:
            gate_ref, *rest = rest
        const_refs = rest[: len(const_specs)]
        if emit_perturbed:
            (cost_out, delta_ref, m_ref, s_ref, pert_ref, acc_ref) = \
                rest[len(const_specs):]
        else:
            cost_out, delta_ref, m_ref, s_ref, acc_ref = rest[len(const_specs):]
        cvals, term_cvals = split_cvals(const_refs)
        i = pl.program_id(0)

        noise = _tp_draw_noise(lead_ref, i, D, bh, block_k, rng_in_kernel,
                               antithetic, op_ref, mu_ref, diag_fast, dtype)
        U_col = U_ref[...]  # (D, 1)
        perturbed = U_col + noise
        if null_action:
            col = jax.lax.broadcasted_iota(jnp.int32, (D, block_k), 1)
            is_null = (col == 0) & (i == 0)
            if null_gate:
                is_null = is_null & (gate_ref[0] != 0)
            perturbed = jnp.where(is_null, 0.0, perturbed)
        if num_elites:
            col = jax.lax.broadcasted_iota(jnp.int32, (D, block_k), 1)
            in_el = (col >= elite_off) & (col < elite_off + num_elites) & (i == 0)
            ext = el_ref[...]
            if block_k > 128:
                ext = jnp.pad(ext, ((0, 0), (0, block_k - 128)))
            perturbed = jnp.where(in_el, ext, perturbed)
        perturbed = jnp.clip(perturbed, lo_ref[...], hi_ref[...])
        if emit_perturbed:
            pert_ref[...] = perturbed
        noise = perturbed - U_col  # rectified (mppi.py:383-385)
        n_for_cost = jnp.abs(noise) if config.noise_abs_cost else noise
        pert_cost = jnp.sum(n_for_cost * a_ref[...], axis=0, keepdims=True)

        total = pert_cost + _tp_rollout_total(closed, cvals, x0_ref[...],
                                              perturbed, config, block_k,
                                              term=term, term_cvals=term_cvals)
        _tp_flash_tail(i, nblocks, total, lam_ref[0], noise, cost_out,
                       delta_ref, m_ref, s_ref, acc_ref, K, K_pad, block_k,
                       dtype)

    lead_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if rng_in_kernel
        else pl.BlockSpec((D, bh), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    op_is_diag = diag_fast
    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            lead_spec,
            pl.BlockSpec((nx, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # op (D, 1) or (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_flat (D, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lambda (1,)
            *((pl.BlockSpec((D, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM),) if num_elites else ()),
            *((pl.BlockSpec(memory_space=pltpu.SMEM),) if null_gate else ()),
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ) + ((
            pl.BlockSpec((D, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ) if emit_perturbed else ()),
        out_shape=(
            jax.ShapeDtypeStruct((1, K_pad), dtype),
            jax.ShapeDtypeStruct((D, 1), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ) + ((
            jax.ShapeDtypeStruct((D, K_pad), dtype),
        ) if emit_perturbed else ()),
        scratch_shapes=[pltpu.VMEM((D, 1), dtype)],
        interpret=False if rng_in_kernel else _interpret(),
    )

    def solve(seed_or_bits, x0T, U2, op, mu_t, lo_t, hi_t, a_flat, lambda_,
              *rest):
        rest = list(rest)
        if num_elites:
            if not rest:
                raise TypeError(
                    "this fused solve was built with num_elites "
                    f"= {num_elites}: pass the (D, 128) elites operand "
                    "(elite columns at their global sample indices) after "
                    "lambda"
                )
            elites_in = (jnp.asarray(rest.pop(0), dtype),)
            if elites_in[0].shape != (D, 128):
                raise TypeError(
                    f"elites operand must be (D, 128) = ({D}, 128), got "
                    f"{elites_in[0].shape}"
                )
        else:
            elites_in = ()
        gate = tuple(rest)
        x0T = jnp.asarray(x0T, dtype)
        if K_pad != K:
            x0T = jnp.pad(x0T, ((0, 0), (0, K_pad - K)))
        gate_in = _tp_gate_operand(gate, null_gate)
        out = fused(
            seed_or_bits,
            x0T,
            jnp.asarray(U2, dtype).reshape(D, 1),
            op.reshape(D, 1) if op_is_diag else op,
            jnp.asarray(mu_t, dtype).reshape(D, 1),
            jnp.asarray(lo_t, dtype).reshape(D, 1),
            jnp.asarray(hi_t, dtype).reshape(D, 1),
            jnp.asarray(a_flat, dtype).reshape(D, 1),
            jnp.asarray(lambda_, dtype).reshape(1),
            *elites_in,
            *gate_in,
            *const_inputs,
        )
        cost_pad, delta, m, s = out[:4]
        base = (delta.reshape(D), m[0], s[0], cost_pad.reshape(K_pad)[:K])
        if emit_perturbed:
            return base + (out[4][:, :K],)
        return base

    # export the kernel's actual grid/padding so wrappers (e.g. the sharded
    # shard_map composition) never re-derive them
    solve.nblocks = nblocks
    solve.K_pad = K_pad
    solve.block_k = block_k
    return solve


def make_transposed_smppi_solve(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    block_k: int = None,
    rng_in_kernel: bool = True,
    emit_perturbed: bool = False,
    null_dynamic_gate: bool = False,
    terminal_final: Callable = None,  # wrapped: (state, u) -> cost
):
    """The SMPPI iteration (reference mppi.py:451-570, arXiv:2112.09988) as
    one transposed K-on-lanes kernel — same design as
    :func:`make_transposed_fused_solve` with the smooth-MPPI lift: noise is
    drawn in action-RATE space, clamped to the rate bounds, integrated onto
    the commanded sequence (``as + delta_t * rate``), clamped to the action
    bounds, the effective noise back-computed through BOTH clamps
    (mppi.py:552), and the smoothness cost ``w * sum ||u_scale *
    diff(actions)||^2`` (mppi.py:558-562) added — diff is a static sublane
    shift by nu in this layout.

    :returns: ``solve(seed_or_bits, x0T (nx, K), U2 (D,), as2 (D,), op,
        mu_t, lo_t, hi_t (rate bounds), alo_t, ahi_t (action bounds),
        a_flat, scalars (3,) [lambda, w_action_seq_cost, delta_t]) ->
        (delta (D,), m (), s (), cost_total (K,))`` with ``U_new = U +
        (delta / s).reshape(T, nu)`` (rate space).

    With ``emit_perturbed`` a fifth return ``perturbed_action (D, K)`` holds
    the post-both-clamps ACTION-space sequences; the rate-space effective
    noise reconstructs outside as ``(pa - as)/delta_t - U`` — the identical
    expression the kernel uses (mppi.py:552), so it is bit-exact.
    """
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    D = T * nu
    dtype = config.dtype
    if dtype != jnp.float32:
        raise ValueError("transposed fused solve requires float32")
    if block_k is None:
        block_k, K_pad = _transposed_block(K, D)
    else:
        if block_k % 128:
            raise ValueError(f"block_k={block_k} must be a multiple of 128")
        K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k
    antithetic = config.antithetic
    diag_fast = config.diag_sigma and not config.noise_rho
    null_action = config.sample_null_action
    null_gate = null_action and null_dynamic_gate
    u_scale = float(config.u_scale)
    bh = block_k // 2 if antithetic else block_k

    closed, consts = _trace_body_transposed(config, dynamics, running_cost,
                                            block_k)
    term = term_consts = None
    if terminal_final is not None:
        term, term_consts = _trace_terminal_transposed(
            config, terminal_final, block_k)
    const_specs, const_inputs, split_cvals = _split_term_consts(
        consts, term_consts)

    def kernel(*refs):
        (lead_ref, x0_ref, U_ref, as_ref, op_ref, mu_ref, lo_ref, hi_ref,
         alo_ref, ahi_ref, a_ref, sc_ref, *rest) = refs
        if null_gate:
            gate_ref, *rest = rest
        const_refs = rest[: len(const_specs)]
        if emit_perturbed:
            (cost_out, delta_ref, m_ref, s_ref, pert_ref, acc_ref) = \
                rest[len(const_specs):]
        else:
            cost_out, delta_ref, m_ref, s_ref, acc_ref = rest[len(const_specs):]
        cvals, term_cvals = split_cvals(const_refs)
        i = pl.program_id(0)
        lam, w_seq, delta_t = sc_ref[0], sc_ref[1], sc_ref[2]

        noise = _tp_draw_noise(lead_ref, i, D, bh, block_k, rng_in_kernel,
                               antithetic, op_ref, mu_ref, diag_fast, dtype)
        U_col = U_ref[...]  # (D, 1) rate-space nominal
        as_col = as_ref[...]  # (D, 1) commanded action sequence
        # rate clamp, integrate, (null row), action clamp (mppi.py:539-552)
        pert_rate = jnp.clip(U_col + noise, lo_ref[...], hi_ref[...])
        pert_act = as_col + pert_rate * delta_t
        if null_action:
            col = jax.lax.broadcasted_iota(jnp.int32, (D, block_k), 1)
            is_null = (col == 0) & (i == 0)
            if null_gate:
                is_null = is_null & (gate_ref[0] != 0)
            pert_act = jnp.where(is_null, 0.0, pert_act)
        pert_act = jnp.clip(pert_act, alo_ref[...], ahi_ref[...])
        if emit_perturbed:
            pert_ref[...] = pert_act
        # effective noise back-computed through both clamps (mppi.py:552)
        noise = (pert_act - as_col) / delta_t - U_col
        n_for_cost = jnp.abs(noise) if config.noise_abs_cost else noise
        pert_cost = jnp.sum(n_for_cost * a_ref[...], axis=0, keepdims=True)

        # smoothness: time-diff is a static sublane shift by nu (mppi.py:558-562)
        diff = pert_act[nu:, :] - pert_act[:-nu, :]
        if u_scale != 1.0:
            diff = diff * u_scale
        smooth = w_seq * jnp.sum(diff * diff, axis=0, keepdims=True)

        total = pert_cost + smooth + _tp_rollout_total(
            closed, cvals, x0_ref[...], pert_act, config, block_k,
            term=term, term_cvals=term_cvals,
        )
        _tp_flash_tail(i, nblocks, total, lam, noise, cost_out, delta_ref,
                       m_ref, s_ref, acc_ref, K, K_pad, block_k, dtype)

    lead_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if rng_in_kernel
        else pl.BlockSpec((D, bh), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    op_is_diag = diag_fast
    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            lead_spec,
            pl.BlockSpec((nx, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # action_sequence (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # op (D, 1) or (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo rate (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi rate (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo action (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi action (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_flat (D, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [lam, w, delta_t] (3,)
            *((pl.BlockSpec(memory_space=pltpu.SMEM),) if null_gate else ()),
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ) + ((
            pl.BlockSpec((D, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ) if emit_perturbed else ()),
        out_shape=(
            jax.ShapeDtypeStruct((1, K_pad), dtype),
            jax.ShapeDtypeStruct((D, 1), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ) + ((
            jax.ShapeDtypeStruct((D, K_pad), dtype),
        ) if emit_perturbed else ()),
        scratch_shapes=[pltpu.VMEM((D, 1), dtype)],
        interpret=False if rng_in_kernel else _interpret(),
    )

    def solve(seed_or_bits, x0T, U2, as2, op, mu_t, lo_t, hi_t, alo_t, ahi_t,
              a_flat, lambda_, w_seq, delta_t, *gate):
        x0T = jnp.asarray(x0T, dtype)
        if K_pad != K:
            x0T = jnp.pad(x0T, ((0, 0), (0, K_pad - K)))
        col = lambda v: jnp.asarray(v, dtype).reshape(D, 1)
        scalars = jnp.stack([
            jnp.asarray(lambda_, dtype).reshape(()),
            jnp.asarray(w_seq, dtype).reshape(()),
            jnp.asarray(delta_t, dtype).reshape(()),
        ])
        gate_in = _tp_gate_operand(gate, null_gate)
        out = fused(
            seed_or_bits, x0T, col(U2), col(as2),
            op.reshape(D, 1) if op_is_diag else op,
            col(mu_t), col(lo_t), col(hi_t), col(alo_t), col(ahi_t),
            col(a_flat), scalars, *gate_in, *const_inputs,
        )
        cost_pad, delta, m, s = out[:4]
        base = (delta.reshape(D), m[0], s[0], cost_pad.reshape(K_pad)[:K])
        if emit_perturbed:
            return base + (out[4][:, :K],)
        return base

    # export the kernel's actual grid/padding so wrappers (e.g. the sharded
    # shard_map composition) never re-derive them
    solve.nblocks = nblocks
    solve.K_pad = K_pad
    solve.block_k = block_k
    return solve


def make_transposed_kmppi_solve(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    block_k: int = None,
    rng_in_kernel: bool = True,
    emit_perturbed: bool = False,
    null_dynamic_gate: bool = False,
    terminal_final: Callable = None,  # wrapped: (state, u) -> cost
):
    """The KMPPI iteration (reference mppi.py:593-688) as one transposed
    K-on-lanes kernel: noise drawn only at the ``nsp`` support points
    (``Dp = nsp*nu`` rows), clamped, kernel-interpolated to the full horizon
    with an in-kernel ``(D, Dp) @ (Dp, bk)`` MXU matmul against
    ``kron(interp_full, I_nu)``, trajectory-clamped, rolled out — and the
    flash-softmax update accumulated in THETA space (mppi.py:672-682), so
    ``delta`` has Dp rows.

    :returns: ``solve(seed_or_bits, x0T (nx, K), U2 (D,), theta2 (Dp,), op,
        mu_p (Dp,), lop, hip (Dp,), lo_t, hi_t (D,), a_flat (D,),
        Wt (D, Dp), lambda) -> (delta_theta (Dp,), m, s, cost_total (K,))``
        with ``theta_new = theta + (delta_theta / s).reshape(nsp, nu)`` and
        ``U_new = interp_full @ theta_new``.

    With ``emit_perturbed`` a fifth return ``perturbed (D, K)`` holds the
    post-trajectory-clamp full-horizon actions; the full-horizon noise
    artifact reconstructs outside as ``perturbed - U`` (the same subtraction
    the kernel's action cost uses).
    """
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    nsp = config.num_support_pts
    D, Dp = T * nu, nsp * nu
    dtype = config.dtype
    if dtype != jnp.float32:
        raise ValueError("transposed fused solve requires float32")
    if block_k is None:
        block_k, K_pad = _transposed_block(K, D)
    else:
        if block_k % 128:
            raise ValueError(f"block_k={block_k} must be a multiple of 128")
        K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k
    antithetic = config.antithetic
    diag_fast = config.diag_sigma and not config.noise_rho
    null_action = config.sample_null_action
    null_gate = null_action and null_dynamic_gate
    bh = block_k // 2 if antithetic else block_k

    closed, consts = _trace_body_transposed(config, dynamics, running_cost,
                                            block_k)
    term = term_consts = None
    if terminal_final is not None:
        term, term_consts = _trace_terminal_transposed(
            config, terminal_final, block_k)
    const_specs, const_inputs, split_cvals = _split_term_consts(
        consts, term_consts)

    def kernel(*refs):
        (lead_ref, x0_ref, U_ref, th_ref, op_ref, mu_ref, lop_ref, hip_ref,
         lo_ref, hi_ref, a_ref, W_ref, lam_ref, *rest) = refs
        if null_gate:
            gate_ref, *rest = rest
        const_refs = rest[: len(const_specs)]
        if emit_perturbed:
            (cost_out, delta_ref, m_ref, s_ref, pert_ref, acc_ref) = \
                rest[len(const_specs):]
        else:
            cost_out, delta_ref, m_ref, s_ref, acc_ref = rest[len(const_specs):]
        cvals, term_cvals = split_cvals(const_refs)
        i = pl.program_id(0)

        noise_th = _tp_draw_noise(lead_ref, i, Dp, bh, block_k, rng_in_kernel,
                                  antithetic, op_ref, mu_ref, diag_fast, dtype)
        th_col = th_ref[...]  # (Dp, 1)
        pert_pts = jnp.clip(th_col + noise_th, lop_ref[...], hip_ref[...])
        noise_th = pert_pts - th_col
        # deparameterize: (D, Dp) @ (Dp, bk) — default precision, matching
        # what XLA does to the same matmul in the scan path
        perturbed = jnp.dot(W_ref[...], pert_pts,
                            preferred_element_type=dtype)
        if null_action:
            col = jax.lax.broadcasted_iota(jnp.int32, (D, block_k), 1)
            is_null = (col == 0) & (i == 0)
            if null_gate:
                is_null = is_null & (gate_ref[0] != 0)
            perturbed = jnp.where(is_null, 0.0, perturbed)
        perturbed = jnp.clip(perturbed, lo_ref[...], hi_ref[...])
        if emit_perturbed:
            pert_ref[...] = perturbed
        U_col = U_ref[...]
        noise_full = perturbed - U_col
        n_for_cost = jnp.abs(noise_full) if config.noise_abs_cost else noise_full
        pert_cost = jnp.sum(n_for_cost * a_ref[...], axis=0, keepdims=True)

        total = pert_cost + _tp_rollout_total(closed, cvals, x0_ref[...],
                                              perturbed, config, block_k,
                                              term=term, term_cvals=term_cvals)
        # the update accumulates THETA-space noise (mppi.py:672-682)
        _tp_flash_tail(i, nblocks, total, lam_ref[0], noise_th, cost_out,
                       delta_ref, m_ref, s_ref, acc_ref, K, K_pad, block_k,
                       dtype)

    lead_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if rng_in_kernel
        else pl.BlockSpec((Dp, bh), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    op_is_diag = diag_fast
    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            lead_spec,
            pl.BlockSpec((nx, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # theta (Dp, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # op (Dp, 1) or (Dp, Dp)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu (Dp, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo pts (Dp, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi pts (Dp, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo traj (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi traj (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_flat (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wt = kron(interp, I) (D, Dp)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lambda (1,)
            *((pl.BlockSpec(memory_space=pltpu.SMEM),) if null_gate else ()),
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ) + ((
            pl.BlockSpec((D, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ) if emit_perturbed else ()),
        out_shape=(
            jax.ShapeDtypeStruct((1, K_pad), dtype),
            jax.ShapeDtypeStruct((Dp, 1), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ) + ((
            jax.ShapeDtypeStruct((D, K_pad), dtype),
        ) if emit_perturbed else ()),
        scratch_shapes=[pltpu.VMEM((Dp, 1), dtype)],
        interpret=False if rng_in_kernel else _interpret(),
    )

    def solve(seed_or_bits, x0T, U2, theta2, op, mu_p, lop, hip, lo_t, hi_t,
              a_flat, Wt, lambda_, *gate):
        x0T = jnp.asarray(x0T, dtype)
        if K_pad != K:
            x0T = jnp.pad(x0T, ((0, 0), (0, K_pad - K)))
        colD = lambda v: jnp.asarray(v, dtype).reshape(D, 1)
        colP = lambda v: jnp.asarray(v, dtype).reshape(Dp, 1)
        gate_in = _tp_gate_operand(gate, null_gate)
        out = fused(
            seed_or_bits, x0T, colD(U2), colP(theta2),
            op.reshape(Dp, 1) if op_is_diag else op,
            colP(mu_p), colP(lop), colP(hip), colD(lo_t), colD(hi_t),
            colD(a_flat), Wt, jnp.asarray(lambda_, dtype).reshape(1),
            *gate_in,
            *const_inputs,
        )
        cost_pad, delta, m, s = out[:4]
        base = (delta.reshape(Dp), m[0], s[0], cost_pad.reshape(K_pad)[:K])
        if emit_perturbed:
            return base + (out[4][:, :K],)
        return base

    # export the kernel's actual grid/padding so wrappers (e.g. the sharded
    # shard_map composition) never re-derive them
    solve.nblocks = nblocks
    solve.K_pad = K_pad
    solve.block_k = block_k
    return solve


def make_transposed_batched_solve(
    config: MPPIConfig,
    num_envs: int,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    block_k: int = None,
    rng_in_kernel: bool = True,
    noise_operand: bool = False,
    terminal_final: Callable = None,  # wrapped: (state, u) -> cost
):
    """The N-plant scenario-batched iteration (reference MPPI_Batched,
    mppi.py:691-873) as one transposed K-on-lanes kernel over a (N, K-blocks)
    grid (K-block loop innermost).

    The reference's defining trait — noise sampled ONCE and shared across
    plants (mppi.py:837-838) — costs nothing here: every plant's K-block
    seeds the hardware PRNG with the block index only, so identical bits are
    regenerated per plant in VMEM instead of reading a shared (K, D) tensor
    from HBM N times; the (N, K, T·nu) perturbed-action tensor (the pod-scale
    memory hog) never exists in HBM at all.  Each plant runs its own
    flash-softmax over K in SMEM scratch (the grid is sequential on the TPU
    core, K-blocks innermost, so per-plant accumulators reset at block 0 and
    finalize at the last block).

    :returns: ``solve(seed_or_bits, x0T (nx, N), U2T (D, N), op, mu_t, lo_t,
        hi_t (D,), aT (D, N), lambda) -> (delta (D, N), ms (2, N),
        cost_total (N, K))`` where ``U_new = U + (delta / ms[1]).T`` and
        ``aT[:, n]`` is plant n's action-cost vector ``lambda * sigma^-1
        U_n`` flattened.  With ``rng_in_kernel=False`` (CPU interpret tests)
        ``seed_or_bits`` is int32 bits of shape (D, K_pad) — shared across
        plants, like the XLA path's single draw.

    ``noise_operand=True`` is the third sampling mode: ``seed_or_bits`` is
    the FINAL shared noise (already bits->normal mapped, antithetic-mirrored,
    correlated and mu-shifted — e.g. one :func:`solve.sample_noise_flat` draw,
    transposed to (D, K_pad) float32).  The kernel then does no sampling work
    at all; each (plant, K-block) grid cell reads its (D, block_k) noise block
    from HBM.  Rationale: ``rng_in_kernel`` regenerates identical bits *and*
    re-runs the bits->normal map once per plant (N-fold redundant VPU work,
    the dominant term of a small-problem solve — docs/DESIGN.md §5), while the
    operand trades that for N·K·D·4B of HBM block reads.  Which side wins is
    shape-dependent; measure with benchmarks/batched_modes.py (all three
    sampling modes through identical step plumbing) before routing.  This
    mode has no Mosaic-only primitives, so it also runs under CPU interpret
    for parity tests.
    """
    if noise_operand and not rng_in_kernel:
        raise ValueError("noise_operand and rng_in_kernel=False are "
                         "mutually exclusive sampling modes")
    if noise_operand:
        rng_in_kernel = False  # no in-kernel PRNG primitives
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    N = int(num_envs)
    D = T * nu
    dtype = config.dtype
    if dtype != jnp.float32:
        raise ValueError("transposed fused solve requires float32")
    if block_k is None:
        block_k, K_pad = _transposed_block(K, D)
    else:
        if block_k % 128:
            raise ValueError(f"block_k={block_k} must be a multiple of 128")
        K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k
    antithetic = config.antithetic
    diag_fast = config.diag_sigma and not config.noise_rho
    bh = block_k // 2 if antithetic else block_k

    closed, consts = _trace_body_transposed(config, dynamics, running_cost,
                                            block_k)
    term = term_consts = None
    if terminal_final is not None:
        term, term_consts = _trace_terminal_transposed(
            config, terminal_final, block_k)
    const_specs, const_inputs, split_cvals = _split_term_consts(
        consts, term_consts)

    def kernel(*refs):
        (lead_ref, x0_ref, U_ref, op_ref, mu_ref, lo_ref, hi_ref, a_ref,
         lam_ref, *rest) = refs
        const_refs = rest[: len(const_specs)]
        (cost_out, delta_ref, ms_ref, acc_ref, m_ref, s_ref) = \
            rest[len(const_specs):]
        cvals, term_cvals = split_cvals(const_refs)
        n = pl.program_id(0)
        i = pl.program_id(1)  # K-block index (innermost)

        # per-plant vectors ride as full (rows, N) VMEM arrays (Mosaic
        # rejects width-1 lane BLOCKS, and width-1 dynamic lane slices crash
        # its backend); this plant's column is selected by a one-hot lane
        # mask + reduction — a cheap, well-supported lane pattern
        def col(ref, rows):
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
            return jnp.sum(
                jnp.where(lane == n, ref[...], 0.0), axis=1, keepdims=True
            )

        # noise seeded by BLOCK index only -> bit-identical across plants,
        # the reference's shared-noise semantics (mppi.py:837-838); in
        # operand mode the final noise block is read instead of regenerated
        if noise_operand:
            noise = lead_ref[...]  # (D, block_k) final shared noise
        else:
            noise = _tp_draw_noise(lead_ref, i, D, bh, block_k, rng_in_kernel,
                                   antithetic, op_ref, mu_ref, diag_fast,
                                   dtype)
        U_col = col(U_ref, D)  # (D, 1): this plant's nominal sequence
        perturbed = jnp.clip(U_col + noise, lo_ref[...], hi_ref[...])
        noise = perturbed - U_col
        n_for_cost = jnp.abs(noise) if config.noise_abs_cost else noise
        pert_cost = jnp.sum(n_for_cost * col(a_ref, D), axis=0, keepdims=True)

        state0 = jnp.broadcast_to(col(x0_ref, nx), (nx, block_k))
        total = pert_cost + _tp_rollout_total(closed, cvals, state0,
                                              perturbed, config, block_k,
                                              term=term, term_cvals=term_cvals)
        total = _tp_mask_phantom(total, i, K, K_pad, block_k)
        cost_out[...] = total.reshape(1, 1, block_k)

        # per-plant streaming flash-softmax (mppi.py:860-868): the K-block
        # loop is innermost, so the scratch accumulators belong to one plant
        # at a time
        logits = -cost_out[...].reshape(1, block_k) / lam_ref[0]
        _tp_flash_accumulate(i, logits, noise, m_ref, s_ref, acc_ref,
                             block_k, dtype)

        @pl.when(i == nblocks - 1)
        def _():
            # masked read-modify-write of this plant's output column (the
            # whole (·, N) outputs are VMEM-resident across the grid)
            laneD = jax.lax.broadcasted_iota(jnp.int32, (D, N), 1)
            delta_ref[...] = jnp.where(
                laneD == n, jnp.broadcast_to(acc_ref[...], (D, N)),
                delta_ref[...],
            )
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, N), 1)
            ms_col = jnp.concatenate(
                [m_ref[0].reshape(1, 1), s_ref[0].reshape(1, 1)], axis=0
            )
            ms_ref[...] = jnp.where(
                lane2 == n, jnp.broadcast_to(ms_col, (2, N)), ms_ref[...]
            )

    if rng_in_kernel:
        lead_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    elif noise_operand:
        # full (D, block_k) FINAL-noise block per grid cell; index depends
        # on the K-block only, so the same block serves every plant
        lead_spec = pl.BlockSpec((D, block_k), lambda n, i: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        lead_spec = pl.BlockSpec((D, bh), lambda n, i: (0, i),
                                 memory_space=pltpu.VMEM)
    op_is_diag = diag_fast
    fused = pl.pallas_call(
        kernel,
        grid=(N, nblocks),
        in_specs=[
            lead_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),    # x0T (nx, N), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),    # U2T (D, N), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),    # op (D, 1) or (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # mu (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # lo (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # hi (D, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # aT (D, N), whole
            pl.BlockSpec(memory_space=pltpu.SMEM),    # lambda (1,)
            *const_specs,
        ],
        out_specs=(
            # rank-3 cost: the (1, 1, block_k) block's last two dims match
            # the array's (1, K-block) exactly, satisfying Mosaic's tiling
            pl.BlockSpec((1, 1, block_k), lambda n, i: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # delta (D, N), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ms (2, N), whole
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 1, K_pad), dtype),
            jax.ShapeDtypeStruct((D, N), dtype),
            jax.ShapeDtypeStruct((2, N), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, 1), dtype),
            pltpu.SMEM((1,), dtype),
            pltpu.SMEM((1,), dtype),
        ],
        interpret=False if rng_in_kernel else _interpret(),
    )

    def solve(seed_or_bits, x0T, U2T, op, mu_t, lo_t, hi_t, aT, lambda_):
        colD = lambda v: jnp.asarray(v, dtype).reshape(D, 1)
        cost_pad, delta, ms = fused(
            seed_or_bits,
            jnp.asarray(x0T, dtype),
            jnp.asarray(U2T, dtype),
            op.reshape(D, 1) if op_is_diag else op,
            colD(mu_t), colD(lo_t), colD(hi_t),
            jnp.asarray(aT, dtype),
            jnp.asarray(lambda_, dtype).reshape(1),
            *const_inputs,
        )
        return delta, ms, cost_pad.reshape(N, K_pad)[:, :K]

    # export the kernel's actual grid/padding so wrappers (e.g. the sharded
    # shard_map composition) never re-derive them
    solve.nblocks = nblocks
    solve.K_pad = K_pad
    solve.block_k = block_k
    solve.noise_operand = noise_operand
    return solve


# ---------------------------------------------------------------------------
# Fused sampling front-end: in-kernel RNG + bounds + action cost
# ---------------------------------------------------------------------------


def sampler_eligible(config, has_specific_sampler: bool, mesh) -> bool:
    """The sampling front-end only touches noise/actions, so unlike the fully
    fused solve it composes with terminal costs, M>1, stochastic dynamics and
    parameterized dynamics (the rollout stays on the XLA scan path).  Only a
    specific-action sampler (user-computed rows must be injected between
    sampling and clamping), sharding (Pallas under GSPMD needs shard_map) and
    non-f32 dtypes are out."""
    return (
        not has_specific_sampler
        and mesh is None
        and config.dtype == jnp.float32
    )


def make_fused_sampler(config: MPPIConfig, block_k: int = None,
                       rng_in_kernel: bool = True):
    """Build the fused sampling front-end: one kernel pass producing the
    clamped perturbed actions and the action perturbation cost.

    Motivation (measured, docs/DESIGN.md §5): noise generation is ~16 µs of
    the ~29 µs flagship solve.  The XLA pipeline materializes the u32 bits,
    the normals, the perturbed actions AND the rectified noise in HBM
    (~5 round trips over (K, D) tensors); here the hardware PRNG generates
    bits directly in VMEM and a single pass writes only ``perturbed2`` —
    the one tensor the rollout actually needs — plus the (K,) action cost.
    The rectified-noise tensor is never materialized: downstream consumers
    use ``omega @ perturbed - U`` (exact because omega sums to 1) and
    ``noise = perturbed - U`` is recomputed lazily for artifacts only.

    Covers the whole reference sampling pipeline (mppi.py:375-417): N(mu,
    Sigma) draws (diagonal fast path, full-covariance cholesky, AR(1)
    temporal correlation via the same (D, D) mixing operator, antithetic
    mirroring), ``sample_null_action`` row zeroing, bound clamping,
    rectified-Gaussian noise semantics and the (abs-)action cost.

    :returns: ``sample(seed_or_bits, U2 (D,), op, mu_t (D,), lo_t (D,),
        hi_t (D,), a_flat (D,)) -> (perturbed2 (K, D), pert_cost (K,))``
        where ``op`` is the (1, D) diagonal lane scale when
        ``config.diag_sigma and not config.noise_rho``, else the (D, D)
        mixing matrix ``kron(A_rho^T, chol^T)`` applied as ``z @ op``.
        With ``rng_in_kernel=False`` (CPU interpret tests), ``seed_or_bits``
        is a pre-generated int32 bits array of shape (K_pad, D) — or
        (K_pad//2, D) under antithetic.
    """
    K, T, nu = config.K, config.T, config.nu
    D = T * nu
    dtype = config.dtype
    if dtype != jnp.float32:
        raise ValueError("fused sampler requires float32")
    if block_k is None:
        block_k = 1024 if K >= 1024 else 128
    K_pad = ((K + block_k - 1) // block_k) * block_k
    nblocks = K_pad // block_k
    antithetic = config.antithetic
    if antithetic and block_k % 2:
        raise ValueError("antithetic sampling needs an even K block")
    diag_fast = config.diag_sigma and not config.noise_rho
    null_action = config.sample_null_action
    bh = block_k // 2 if antithetic else block_k

    def kernel(lead_ref, U_ref, op_ref, mu_ref, lo_ref, hi_ref, a_ref,
               pert_out, cost_out):
        i = pl.program_id(0)
        if rng_in_kernel:
            # distinct stream per (solve, block): fold the block index into
            # the first seed word (the words come from a threefry split —
            # effectively random 64 bits, adjacent-seed overlap immaterial)
            pltpu.prng_seed(lead_ref[0] + i, lead_ref[1])
            bits = pltpu.prng_random_bits((bh, D))
        else:
            bits = lead_ref[...]
        z = _bits_to_normal(bits, use_pltpu=rng_in_kernel and not _interpret())
        if antithetic:
            # adjacent-half mirroring within the block: marginals stay
            # N(0, 1), pairs (j, j + block/2) perfectly anti-correlated —
            # same variance-reduction property as the XLA path's global
            # (k, K/2 + k) pairing, different pair arrangement
            z = jnp.concatenate([z, -z], axis=0)
        if diag_fast:
            noise = z * op_ref[...] + mu_ref[...]
        else:
            # per-timestep correlation (+ optional AR(1) time mixing) as one
            # MXU matmul against the (D, D) block operator; HIGHEST precision
            # — default bf16 inputs put ~0.4% error on the noise itself
            noise = jnp.dot(
                z, op_ref[...], preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            ) + mu_ref[...]
        U_row = U_ref[...]  # (1, D)
        perturbed = U_row + noise
        if null_action:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_k, D), 0)
            perturbed = jnp.where((row == 0) & (i == 0), 0.0, perturbed)
        perturbed = jnp.clip(perturbed, lo_ref[...], hi_ref[...])
        pert_out[...] = perturbed
        # rectified-Gaussian action cost (mppi.py:383-385, 407-417); the
        # rectified noise itself stays in VMEM
        noise_r = perturbed - U_row
        n_for_cost = jnp.abs(noise_r) if config.noise_abs_cost else noise_r
        cost_out[...] = jnp.sum(n_for_cost * a_ref[...], axis=1).reshape(
            1, block_k
        )

    lead_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if rng_in_kernel
        else pl.BlockSpec((bh, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            lead_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U flat (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (1, D) or C (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_flat (1, D)
        ],
        out_specs=(
            pl.BlockSpec((block_k, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K_pad, D), dtype),
            jax.ShapeDtypeStruct((1, K_pad), dtype),
        ),
        interpret=_interpret() if not rng_in_kernel else False,
    )

    def sample(seed_or_bits, U2, op, mu_t, lo_t, hi_t, a_flat):
        pert, cost = fused(
            seed_or_bits,
            jnp.asarray(U2, dtype).reshape(1, D),
            op if op.ndim == 2 and op.shape[0] == D else op.reshape(1, D),
            jnp.asarray(mu_t, dtype).reshape(1, D),
            jnp.asarray(lo_t, dtype).reshape(1, D),
            jnp.asarray(hi_t, dtype).reshape(1, D),
            jnp.asarray(a_flat, dtype).reshape(1, D),
        )
        if K_pad != K:
            pert = pert[:K]
            cost = cost[:, :K]
        return pert, cost.reshape(-1)

    return sample


# ---------------------------------------------------------------------------
# Fully-fused solve: in-kernel RNG + bounds + action cost + rollout + update
# ---------------------------------------------------------------------------


def key_to_seed(key):
    """Derive the (2,) int32 seed :func:`make_fused_solve` (rng_in_kernel=True)
    takes from a JAX PRNG key (typed or raw uint32)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key
    kd = kd.reshape(-1)[:2].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(kd, jnp.int32)


def _bits_to_normal(bits, use_pltpu=None):
    """int32 random bits -> standard normal, entirely on the VPU.

    Exponent trick: logical-shift the 23 high mantissa bits into a float in
    [1, 2), subtract 1 for U[0, 1), then invert the Gaussian CDF with
    ``erf_inv`` (the same map ``jax.random.normal`` uses).  A half-ulp offset
    keeps u strictly inside (0, 1) so erf_inv never hits +-inf.

    ``use_pltpu`` selects the bitcast implementation: ``pltpu.bitcast`` only
    lowers inside compiled Mosaic kernels, ``lax.bitcast_convert_type``
    everywhere else (interpret mode, plain jit/XLA — the safe DEFAULT, so
    callers outside a kernel never hit a lowering error on the TPU backend);
    compiled-kernel bodies pass ``use_pltpu=not _interpret()`` explicitly.
    """
    mant = jax.lax.shift_right_logical(bits, jnp.int32(9))
    fbits = jax.lax.bitwise_or(mant, jnp.int32(0x3F800000))
    if use_pltpu is None:
        use_pltpu = False
    if use_pltpu:
        f = pltpu.bitcast(fbits, jnp.float32)
    else:
        f = jax.lax.bitcast_convert_type(fbits, jnp.float32)
    u = f - 1.0 + jnp.float32(2.0**-24)
    return jnp.float32(1.4142135623730951) * jax.lax.erf_inv(2.0 * u - 1.0)


def make_fused_solve(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
    rng_in_kernel: bool = True,
):
    """Build the whole MPPI solve as ONE Pallas kernel.

    Fuses the complete per-solve pipeline (reference call stack SURVEY.md §3.1 /
    mppi.py:240-275): Gaussian noise generation (on-chip hardware PRNG — the
    (K, T, nu) noise tensor never exists in HBM), bound rectification
    (mppi.py:375-385), the action perturbation cost (mppi.py:407-417), the T-step
    rollout + running cost (mppi.py:312-331), and the flash-softmax weighted
    noise reduction (mppi.py:254-270) — all in a single pass over K blocks.

    HBM traffic per solve is O(K) (the cost vector out) instead of the scan
    path's ~6 full (K, T, nu) tensors; at K=10k, T=30 that is the difference
    between ~60 us and ~15 us on a v5e chip.

    With ``rng_in_kernel=False`` the kernel takes pre-generated int32 bits as an
    input instead of seeding the hardware PRNG — the path CPU interpret-mode
    tests use (``prng_seed`` has no CPU lowering), identical from the
    uniform->normal conversion onward.

    :returns: ``solve(seed_or_bits, x0 (nx,), U (T, nu), chol (nu, nu),
        mu (nu,), lo (nu,), hi (nu,), a_flat (T*nu,), lambda) ->
        (delta (T, nu), m (), s (), cost_total (K,))`` where
        ``U_new = U + delta / s`` and (m, s) recover omega via
        :func:`weighting_from_stats`.  ``a_flat = lambda * (U @ sigma_inv^T)``
        flattened, computed by the caller (one tiny (T, nu) matmul in XLA).
    """
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    dtype = config.dtype
    D = T * nu
    # smaller K-block than the rollout-only kernel: this one keeps ~8 live
    # (block, D->128-lane-padded) f32 buffers (bits/z/noise/perturbed/...)
    # per grid step, and block=1024 busts the 16M VMEM scoped limit at T=30
    block_k, K_pad = fused_solve_block_and_pad(K)
    nblocks = K_pad // block_k

    def _body(state, u, t):
        ns = dynamics(None, state, u, t, None)
        c = running_cost(ns, u, t)
        return ns, c

    closed = jax.make_jaxpr(_body)(
        jnp.zeros((block_k, nx), dtype),
        jnp.zeros((block_k, nu), dtype),
        jnp.zeros((), jnp.int32),
    )
    consts = closed.consts

    def converted(state, u, t, *const_vals):
        outs = jax.core.eval_jaxpr(closed.jaxpr, const_vals, state, u, t)
        return outs[0], outs[1]

    const_specs, const_inputs, const_unpack = [], [], []
    for cst in consts:
        cst = jnp.asarray(cst)
        if cst.ndim == 0:
            const_inputs.append(cst.reshape(1))
            const_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            const_unpack.append(lambda ref: ref[0])
        else:
            const_inputs.append(cst)
            const_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            const_unpack.append(lambda ref: ref[...])

    u_scale = float(config.u_scale)  # Python literal: folds into the kernel IR
    null_action = config.sample_null_action

    def kernel(*refs):
        if rng_in_kernel:
            (seed_ref, x0_ref, U_ref, C_ref, mu_ref, lo_ref, hi_ref, a_ref,
             lam_ref, *rest) = refs
        else:
            (bits_ref, x0_ref, U_ref, C_ref, mu_ref, lo_ref, hi_ref, a_ref,
             lam_ref, *rest) = refs
        const_refs = rest[: len(const_specs)]
        cost_out, delta_ref, m_ref, s_ref, acc_ref = rest[len(const_specs):]
        cvals = [unpack(r) for unpack, r in zip(const_unpack, const_refs)]
        i = pl.program_id(0)

        # -- noise: bits -> N(0,1) -> correlate with the (tiled) cholesky ------
        if rng_in_kernel:
            # distinct stream per (solve, block); the hardware seed takes at
            # most 2 words, so the block index folds into the first (the two
            # words come from a threefry split — effectively random 64 bits,
            # so the +i overlap between adjacent seeds is immaterial)
            pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
            bits = pltpu.prng_random_bits((block_k, D))
        else:
            bits = bits_ref[...]
        z = _bits_to_normal(bits, use_pltpu=not _interpret())  # (block_k, D)
        # correlate per-timestep nu-vectors: z2 @ kron(I_T, chol^T) == blockwise
        # z[:, t*nu:(t+1)*nu] @ chol^T; nu is tiny so do it as nu column slices
        # of an MXU matmul against the (D, D) block-diagonal operator.
        # HIGHEST precision: default MXU input precision is bf16 (~0.4% noise
        # error, which the quadratic costs double); this one matmul is a
        # negligible share of the kernel.
        noise = jnp.dot(
            z, C_ref[...], preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        ) + mu_ref[...]

        U_flat = U_ref[...]  # (1, D)
        perturbed = U_flat + noise
        if null_action:
            # row 0 of block 0 is the all-zeros action (mppi.py:390-392)
            row = jax.lax.broadcasted_iota(jnp.int32, (block_k, D), 0)
            perturbed = jnp.where((row == 0) & (i == 0), 0.0, perturbed)
        perturbed = jnp.clip(perturbed, lo_ref[...], hi_ref[...])
        noise = perturbed - U_flat  # rectified-Gaussian semantics (mppi.py:383-385)

        # -- action perturbation cost: a lane reduction (mppi.py:407-417) ------
        n_for_cost = jnp.abs(noise) if config.noise_abs_cost else noise
        pert_cost = jnp.sum(n_for_cost * a_ref[...], axis=1)

        # -- rollout: state lives in VMEM for the whole horizon ----------------
        state = jnp.broadcast_to(x0_ref[...], (block_k, nx))
        total = pert_cost
        for t in range(T):
            u_t = perturbed[:, t * nu : (t + 1) * nu] * u_scale
            state, c = converted(state, u_t, jnp.int32(t), *cvals)
            total = total + c.reshape(block_k)
        if K_pad != K:
            # phantom rows (global index >= K) get +inf cost -> weight exactly 0
            # (2-D iota: Mosaic has no 1-D iota lowering)
            gid = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0).reshape(
                block_k
            ) + i * block_k
            total = jnp.where(gid < K, total, jnp.inf)
        # 2-D (1, block_k) row layout: XLA tiles 1-D outputs T(1024), which
        # clashes with a 512-row block; rows of a 2-D output have no such tile
        cost_out[...] = total.reshape(1, block_k)

        # -- flash-softmax weighted reduction (mppi.py:254-270) ----------------
        # reload from the ref: reductions over computed vectors can carry
        # non-canonical layouts Mosaic refuses to reduce ("Offset change")
        logits = -cost_out[...].reshape(block_k) / lam_ref[0]
        blk_m = jnp.max(logits)

        @pl.when(i == 0)
        def _():
            m_ref[0] = -jnp.inf
            s_ref[0] = 0.0
            acc_ref[...] = jnp.zeros_like(acc_ref)

        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, blk_m)
        scale = jnp.exp(m_old - m_new)
        w = jnp.exp(logits - m_new)
        s_ref[0] = s_ref[0] * scale + jnp.sum(w)
        acc_ref[...] = acc_ref[...] * scale + jnp.dot(
            w.reshape(1, block_k), noise, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_ref[0] = m_new

        @pl.when(i == nblocks - 1)
        def _():
            delta_ref[...] = acc_ref[...]

    lead_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)  # seed (2,) int32
        if rng_in_kernel
        else pl.BlockSpec((block_k, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            lead_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x0 (1, nx)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U flat (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # C block-diag (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi tiled (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_flat (1, D)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lambda (1,)
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, K_pad), dtype),  # cost row (padded)
            jax.ShapeDtypeStruct((1, D), dtype),  # delta (unnormalized)
            jax.ShapeDtypeStruct((1,), dtype),  # m
            jax.ShapeDtypeStruct((1,), dtype),  # s
        ),
        scratch_shapes=[pltpu.VMEM((1, D), dtype)],
        interpret=_interpret(),
    )

    def solve(seed_or_bits, x0, U, chol, mu, lo, hi, a_flat, lambda_):
        # tile the per-timestep (nu,) vectors across the horizon once, in XLA
        C = jnp.kron(jnp.eye(T, dtype=dtype), chol.T)  # (D, D) block-diag
        mu_t = jnp.tile(mu, T).reshape(1, D)
        lo_t = jnp.tile(jnp.broadcast_to(lo, (nu,)), T).reshape(1, D)
        hi_t = jnp.tile(jnp.broadcast_to(hi, (nu,)), T).reshape(1, D)
        cost_pad, delta, m, s = fused(
            seed_or_bits,
            jnp.asarray(x0, dtype).reshape(1, nx),
            jnp.asarray(U, dtype).reshape(1, D),
            C,
            mu_t,
            lo_t,
            hi_t,
            jnp.asarray(a_flat, dtype).reshape(1, D),
            jnp.asarray(lambda_, dtype).reshape(1),
            *const_inputs,
        )
        return delta.reshape(T, nu), m[0], s[0], cost_pad.reshape(K_pad)[:K]

    return solve


@functools.partial(jax.jit, static_argnames=())
def weighting_from_stats(cost_total, lambda_, m, s):
    """Recover the reference's introspection artifacts from the streaming stats:
    cost_total_non_zero = exp(-(c - beta)/lambda) = exp(l - m), omega = that / s
    (mppi.py:254-259)."""
    logits = -cost_total / lambda_
    ctnz = jnp.exp(logits - m)
    return ctnz, ctnz / s
