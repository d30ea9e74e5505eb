"""Fused Pallas TPU kernels for the MPPI hot path.

Two kernels, per the north-star design (BASELINE.json; SURVEY.md §2.4):

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


def pallas_eligible(config: MPPIConfig, has_terminal: bool, has_specific: bool) -> bool:
    return (
        config.M == 1
        and not has_terminal
        and not has_specific
        and not config.stochastic_dynamics
        and config.dtype == jnp.float32
    )


def make_fused_rollout(
    config: MPPIConfig,
    dynamics: Callable,  # wrapped: (dyn_params, state, u, t, key) -> next_state
    running_cost: Callable,  # wrapped: (state, u, t) -> cost
):
    """Build the fused rollout: (x0 (K, nx), u_scaled (T, K, nu)) -> cost (K,).

    User dynamics/cost typically close over arrays (goal vectors, B matrices);
    Pallas kernels cannot capture traced constants, so ``jax.closure_convert``
    hoists them into explicit kernel inputs.
    """
    K, T, nx, nu = config.K, config.T, config.nx, config.nu
    dtype = config.dtype
    block_k, K_pad = _block_and_pad(K)
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
        out_ref[...] = total

    fused = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_k, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, T * nu), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((block_k,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K_pad,), dtype),
        interpret=_interpret(),
    )

    def rollout(x0_K, u_scaled_ktn):
        """x0_K: (K, nx) initial states; u_scaled_ktn: (K, T, nu) scaled actions."""
        u2d = u_scaled_ktn.reshape(K, T * nu)
        if K_pad != K:
            x0_K = jnp.pad(x0_K, ((0, K_pad - K), (0, 0)))
            u2d = jnp.pad(u2d, ((0, K_pad - K), (0, 0)))
        return fused(x0_K, u2d, *const_inputs)[:K]

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

    def kernel(lam_ref, cost_ref, noise_ref, pert_ref, m_ref, s_ref, acc_ref):
        i = pl.program_id(0)
        logits = -cost_ref[...] / lam_ref[0]  # (block_k,)
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
        acc_ref[...] = acc_ref[...] * scale + w[None, :] @ noise_ref[...]
        m_ref[0] = m_new

        @pl.when(i == nblocks - 1)
        def _():
            pert_ref[...] = acc_ref[...]

    pert, m, s = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lambda (1,)
            pl.BlockSpec((block_k,), lambda i: (i,), memory_space=pltpu.VMEM),
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


@functools.partial(jax.jit, static_argnames=())
def weighting_from_stats(cost_total, lambda_, m, s):
    """Recover the reference's introspection artifacts from the streaming stats:
    cost_total_non_zero = exp(-(c - beta)/lambda) = exp(l - m), omega = that / s
    (mppi.py:254-259)."""
    logits = -cost_total / lambda_
    ctnz = jnp.exp(logits - m)
    return ctnz, ctnz / s
